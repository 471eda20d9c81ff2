"""Degenerate-cluster step-up (VERDICT r04 #5 'Done' criterion).

Near-constant embeddings — boilerplate-heavy crawl data — collapse
into one k-means cluster / LSH bucket, so the within-cluster pair
joins in `semantic_neardup` and `embedding_neardup_pairs` emit B²
output. This tool builds that worst case deterministically (C clone
vectors + a spread tail), steps the clone mass up K×, and records
output rows + wall time for the uncapped vs capped variants:

- uncapped output must grow ~K² (the quadratic bomb, demonstrated);
- capped output must grow ~K (bounded by cap·N), the property a
  100-TB run needs.

Usage: python tools/degenerate_stepup.py [--clones 2000] [--k 4]
       [--cap 50] [--out BENCH/degenerate_stepup.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_degenerate(spark, n_clones: int, n_spread: int):
    from pyspark.sql import functions as F

    clones = spark.range(n_clones).select(
        F.concat(F.lit("c"), F.col("id")).alias("vec_id"),
        F.array(
            *[
                (F.lit(1.0) + F.col("id") * 1e-9).cast("float")
                if i == 0
                else F.lit(float(i) / 8.0).cast("float")
                for i in range(8)
            ]
        ).alias("embedding"),
    )
    spread = spark.range(n_spread).select(
        F.concat(F.lit("s"), F.col("id")).alias("vec_id"),
        F.array(
            *[
                (
                    F.when(F.col("id") % 8 == i, F.lit(5.0)).otherwise(
                        F.lit(0.01) * F.col("id") * (i + 1)
                    )
                ).cast("float")
                for i in range(8)
            ]
        ).alias("embedding"),
    )
    return clones.unionByName(spread)


def run_case(spark, n_clones: int, cap):
    from py_sema_spark.operators.similarity import semantic_neardup

    emb = build_degenerate(spark, n_clones, n_clones // 10).persist()
    emb.count()
    t0 = time.time()
    pairs = semantic_neardup(
        emb, k=4, iterations=2, threshold=0.999, max_cluster_size=cap
    ).count()
    dt = time.time() - t0
    emb.unpersist()
    return {"clones": n_clones, "cap": cap, "pairs": pairs,
            "sec": round(dt, 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clones", type=int, default=2000)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--cap", type=int, default=50)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "degenerate_stepup.json"))
    args = ap.parse_args()

    from py_sema_spark.session import build_session

    spark = build_session("degenerate-stepup")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for n in (args.clones, args.clones * args.k):
        for cap in (None, args.cap):
            r = run_case(spark, n, cap)
            rows.append(r)
            print(json.dumps(r), flush=True)

    by = {(r["clones"], r["cap"] is None): r for r in rows}
    lo_u = by[(args.clones, True)]
    hi_u = by[(args.clones * args.k, True)]
    lo_c = by[(args.clones, False)]
    hi_c = by[(args.clones * args.k, False)]
    summary = {
        "k": args.k,
        "uncapped_pair_growth": round(hi_u["pairs"] / lo_u["pairs"], 2),
        "capped_pair_growth": round(hi_c["pairs"] / max(lo_c["pairs"], 1), 2),
        "quadratic_expected": args.k ** 2,
        "linear_expected": args.k,
        "rows": rows,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
