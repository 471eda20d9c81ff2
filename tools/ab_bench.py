"""Paired A/B bench harness (VERDICT r02 #6: quiet-window hardening).

The single-binary suite swings 2-4x with host noise, so round-over-
round deltas measured from two separate windows are unreliable.  This
harness keeps BOTH binaries alive (one persistent child process +
SparkSession per variant) and alternates them PER QUERY — A,B for one
rep, B,A for the next — so each comparison is paired under the same
instantaneous host load and ordering bias cancels.

Variants are git revisions (materialized read-only via ``git
archive``) or the literal ``WORKTREE`` for the current tree.  Only one
child executes at a time (the other JVM idles), so the variants never
contend with each other.

Usage:
  python tools/ab_bench.py --base HEAD~1 [--cand WORKTREE]
        [--reps 2] [--sf /root/testdata/sf0.1] [--cpus 32]
        [--queries q1,q2,...] [--out BENCH/ab_last.json]

Output: one JSON file {query: {"a": [...], "b": [...], "ratio": r}}
plus a summary (geomean ratio, regressions > --flag-ratio).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- child

def serve(codedir: str, sf_dir: str, cpus: int) -> None:
    """Persistent query server: one line in (query name), one line out
    (``OK <name> <secs>`` / ``ERR <name> <msg>``)."""
    sys.path.insert(0, codedir)
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(cpus))
    from py_sema_spark.queries.benchqueries import QUERIES
    from py_sema_spark.session import build_session

    spark = build_session(master=f"local[{cpus}]")
    print("READY", flush=True)
    for line in sys.stdin:
        name = line.strip()
        if not name or name == "QUIT":
            break
        try:
            if name == "kg_pipeline":
                # flagship throughput stage (VERDICT r03 #2: pair it) —
                # same corpus sizing as bench.main; run_kg_pipeline
                # times only the scan→extract→dedup section
                import bench

                try:
                    sfv = float(sf_dir.rstrip("/").split("sf")[-1])
                except ValueError:
                    sfv = 0.01
                n_pages = int(os.environ.get(
                    "SPARK_GRAFT_PAGES",
                    str(max(2000, int(sfv * 200_000))),
                ))
                r = bench.run_kg_pipeline(spark, n_pages)
                print(f"OK {name} {r['sec']:.4f}", flush=True)
                continue
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"OK {name} {time.time() - t0:.4f}", flush=True)
        except Exception as e:  # report, keep serving
            msg = str(e).replace("\n", " ")[:300]
            print(f"ERR {name} {msg}", flush=True)
    spark.stop()


# --------------------------------------------------------------- parent

class Variant:
    def __init__(self, label: str, ref: str, sf: str, cpus: int, tmp: str):
        self.label, self.ref = label, ref
        if ref == "WORKTREE":
            codedir = REPO
        else:
            codedir = os.path.join(tmp, f"code_{label}")
            os.makedirs(codedir, exist_ok=True)
            tar = subprocess.run(
                ["git", "-C", REPO, "archive", ref],
                check=True, stdout=subprocess.PIPE,
            )
            subprocess.run(
                ["tar", "-x", "-C", codedir], input=tar.stdout, check=True
            )
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--serve", codedir, sf, str(cpus)],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, cwd=codedir,
        )

    def _readline(self) -> str:
        line = self.proc.stdout.readline()
        if not line:
            raise RuntimeError(f"variant {self.label} ({self.ref}) died")
        return line.strip()

    def wait_ready(self) -> None:
        while True:
            if self._readline() == "READY":
                return

    def run(self, name: str):
        self.proc.stdin.write(name + "\n")
        self.proc.stdin.flush()
        while True:
            line = self._readline()
            if line.startswith(("OK ", "ERR ")):
                break
        tag, _qname, rest = line.split(" ", 2)
        return float(rest) if tag == "OK" else rest

    def close(self) -> None:
        try:
            self.proc.stdin.write("QUIT\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True,
                    help="git rev of the A side (e.g. HEAD~1, r02 tag)")
    ap.add_argument("--cand", default="WORKTREE",
                    help="git rev of the B side, or WORKTREE (default)")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", default=None,
                    help="comma list; default: bench.py BENCH_QUERIES")
    ap.add_argument("--warmup", type=int, default=0,
                    help="untimed warm-up runs of each query per "
                         "variant before the timed reps (first-run "
                         "JVM/code-gen warm-up otherwise lands inside "
                         "the median)")
    ap.add_argument("--flag-ratio", type=float, default=1.5)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH",
                                                  "ab_last.json"))
    args = ap.parse_args()

    if args.queries:
        names = [q.strip() for q in args.queries.split(",") if q.strip()]
    else:
        sys.path.insert(0, REPO)
        import bench

        # the flagship leads so its pairs land before any thermal drift
        names = ["kg_pipeline"] + list(bench.BENCH_QUERIES)

    with tempfile.TemporaryDirectory(prefix="ab_bench_") as tmp:
        a = Variant("a", args.base, args.sf, args.cpus, tmp)
        b = Variant("b", args.cand, args.sf, args.cpus, tmp)
        try:
            a.wait_ready()
            b.wait_ready()
            results: dict = {}
            for qi, name in enumerate(names):
                ta, tb, err = [], [], None
                for _ in range(args.warmup):
                    a.run(name)
                    b.run(name)
                for rep in range(args.reps):
                    order = (a, b) if rep % 2 == 0 else (b, a)
                    for v in order:
                        r = v.run(name)
                        if isinstance(r, str):
                            err = f"{v.label}: {r}"
                            continue
                        (ta if v is a else tb).append(r)
                entry: dict = {"a": ta, "b": tb}
                if err:
                    entry["err"] = err
                if ta and tb:
                    entry["ratio"] = round(
                        statistics.median(tb) / statistics.median(ta), 3
                    )
                results[name] = entry
                print(f"[{qi + 1}/{len(names)}] {name}: "
                      f"a={ta} b={tb} ratio={entry.get('ratio')}",
                      flush=True)
        finally:
            a.close()
            b.close()

    ratios = [e["ratio"] for e in results.values() if "ratio" in e]
    summary = {
        "base": args.base,
        "cand": args.cand,
        "sf": args.sf,
        "cpus": args.cpus,
        "reps": args.reps,
        "queries": len(names),
        "paired": len(ratios),
        "geomean_ratio": round(
            math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 3
        ) if ratios else None,
        "regressed": sorted(
            n for n, e in results.items()
            if e.get("ratio", 0) > args.flag_ratio
        ),
        "improved": sorted(
            n for n, e in results.items()
            if 0 < e.get("ratio", 1) < 1 / args.flag_ratio
        ),
    }
    out = {"summary": summary, "results": results}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--serve":
        serve(sys.argv[2], sys.argv[3], int(sys.argv[4]))
    else:
        main()
