"""Host capacity curve: per-core compute rate vs active-core count.

The N -> 4N scaling rule is measured on ONE shared box in this
sandbox, so the feasible efficiency ceiling is set by the host, not
by the job: as more cores go busy, per-core clock/shared-resource
throughput drops even for embarrassingly-parallel, cache-resident
work. This probe runs K pinned worker processes (one per core), each
doing identical fixed CPU work (md5 chain — no memory pressure, no
IPC), and reports the mean per-worker rate at each K. The ratio
rate(4N)/rate(N) is the efficiency a PERFECT job could measure — use
it as the denominator when judging a real job's N -> 4N number.

Usage: python tools/capacity_curve.py [k1 k2 ...]   (default 1 2 4 8 16 32)
"""

from __future__ import annotations

import json
import subprocess
import sys

WORK = """
import time, hashlib
t0 = time.time()
h = b"x"
for _ in range(600000):
    h = hashlib.md5(h).digest()
print(time.time() - t0)
"""


def run_k(k: int) -> float:
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", WORK],
            stdout=subprocess.PIPE,
        )
        for i in range(k)
    ]
    times = [float(p.communicate()[0]) for p in procs]
    return sum(times) / len(times)


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    rows = []
    for k in ks:
        t = run_k(k)
        rows.append({"k": k, "mean_worker_sec": round(t, 3),
                     "per_core_rate": round(1 / t, 3)})
        print(json.dumps(rows[-1]))
    by = {r["k"]: r["per_core_rate"] for r in rows}
    for n in ks:
        if 4 * n in by:
            print(json.dumps({
                "pair": f"{n}->{4*n}",
                "feasible_efficiency_ceiling": round(by[4 * n] / by[n], 3),
            }))


if __name__ == "__main__":
    main()
