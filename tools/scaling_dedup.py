"""Second scaling pair, on a SHUFFLE-HEAVY job: MinHash+LSH near-dup
over the sf0.1 documents table at local[N] vs local[4N], fresh JVM per
level (same protocol as tools/scaling_bench.py, which measures the
embarrassingly-parallel flagship — this one exercises the exchange-
bound path: signature groupBy, band-bucket self-join, 4.5M-pair
verification).

Usage: python tools/scaling_dedup.py [sf_dir] [N] [4N]
Prints a JSON line; append results to BENCH/BASELINE.md by hand.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys, time
sys.path.insert(0, ".")
from py_sema_spark.session import build_session
from py_sema_spark.operators.dedup import minhash_dedup

cpus = int(sys.argv[1]); sf = sys.argv[2]
spark = build_session("scaling-dedup", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf}/documents.parquet")
# warm JVM/Arrow on a slice, untimed
minhash_dedup(docs.limit(50), threshold=0.7, num_perm=16, bands=4).count()
best = None
for _ in range(2):
    t0 = time.time()
    n = minhash_dedup(docs, threshold=0.7, num_perm=16, bands=4).count()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print("RESULT " + json.dumps({"cpus": cpus, "pairs": n, "sec": round(best, 2),
                              "pairs_per_sec": round(n / best, 1)}))
"""


def run(cpus: int, sf: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), sf],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise SystemExit(f"child failed:\n{out.stdout}\n{out.stderr}")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n4 = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    lo = run(n, sf)
    hi = run(n4, sf)
    eff = (hi["pairs_per_sec"] / lo["pairs_per_sec"]) / (n4 / n)
    print(json.dumps({"N": lo, "4N": hi, "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
