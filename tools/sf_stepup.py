"""Scale-factor step-up on the heavy operator families (VERDICT r03
ask #6): everything is attested at sf0.01 and benched at sf0.1 — this
tool runs the dedup / ANN / graph families once at a synthetic 10×
(≈sf1) to catch constants the fixture scale hides (bucket skew caps,
closure round counts, AQE coalescing vs repartition pins).

Scaled corpus construction (deterministic, no external data):

- ``documents``: K vocabulary-shifted replicas — every token gets an
  ALPHANUMERIC replica suffix (``x3``, not ``_3``: the canonical
  tokenizer strips punctuation, so an underscore suffix detaches and
  the replicas collapse back into exact minhash clones — found the
  hard way, it produced a 100× candidate-pair blowup), so
  INTRA-replica similarity structure (shingles, minhash bands,
  fingerprints) is preserved exactly while replicas stay mutually
  dissimilar → near-dup pair counts scale ~K×, not K² (plain
  replication would make every doc a 10-way exact dup and measure a
  different workload — though that workload is ALSO real: crawls are
  boilerplate-heavy, which is what max_bucket_size is for).
- ``embeddings``: K circular-shifted replicas — a shift-by-k vector is
  near-orthogonal to the original for random-ish embeddings, so LSH /
  IVF bucket geometry scales ~K× without K² duplicate-pair blowup.
- remaining tables copied verbatim (the heavy families don't read
  them).

Usage: python tools/sf_stepup.py [--k 10] [--sf /root/testdata/sf0.1]
       [--reps 2] [--out BENCH/sf_stepup.json]

Verdict gate: per-family wall-time growth ≤ 2× the row-count growth
(flagged in the output as ``superlinear``).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# family → queries (all from the contract registry)
FAMILIES = {
    "dedup": [
        "exact_dedup", "line_dedup", "minhash_neardup_shingle",
        "neardup_clusters", "incremental_minhash", "semantic_neardup",
    ],
    "ann": [
        "lsh_cosine_topk", "ivf_cosine_topk", "quantized_cosine_topk",
        "embedding_neardup_lsh",
    ],
    "graph": [
        "pagerank", "connected_components", "transitive_closure",
        "trustrank", "triangle_count", "label_propagation",
    ],
}


def build_scaled(spark, sf_dir: str, out_dir: str, k: int) -> dict:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    growth = {}
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        dst = f"{out_dir}/{t}.parquet"
        if t == "documents":
            docs = spark.read.parquet(src)
            n = docs.count()
            reps = []
            for r in range(k):
                suffix = F.lit(f"x{r}")
                reps.append(docs.select(
                    (F.col("doc_id") + F.lit(r * n)).alias("doc_id"),
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda x: F.concat(x, suffix),
                        ),
                        " ",
                    ).alias("text"),
                    "lang", "source",
                    F.col("n_chars").alias("n_chars"),
                ))
            scaled = reps[0]
            for rdf in reps[1:]:
                scaled = scaled.unionByName(rdf)
            scaled.repartition(32).write.mode("overwrite").parquet(dst)
            growth[t] = k
        elif t == "embeddings":
            emb = spark.read.parquet(src)
            n = emb.count()
            dim = len(emb.select("embedding").first()["embedding"])
            reps = []
            for r in range(k):
                s = r % dim
                if s == 0:
                    shifted = F.col("embedding")
                else:
                    shifted = F.concat(
                        F.slice(F.col("embedding"), s + 1, dim - s),
                        F.slice(F.col("embedding"), 1, s),
                    )
                reps.append(emb.select(
                    (F.col("vec_id") + F.lit(r * n)).alias("vec_id"),
                    shifted.alias("embedding"),
                    "label",
                ))
            scaled = reps[0]
            for rdf in reps[1:]:
                scaled = scaled.unionByName(rdf)
            scaled.repartition(16).write.mode("overwrite").parquet(dst)
            growth[t] = k
        else:
            if os.path.isdir(src):
                shutil.copytree(src, dst, dirs_exist_ok=True)
            else:
                shutil.copy(src, dst)
            growth[t] = 1
    return growth


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default=os.path.join(
        REPO, "BENCH", "sf_stepup.json"))
    ap.add_argument("--families", default="dedup,ann,graph")
    args = ap.parse_args()

    from py_sema_spark.queries.benchqueries import QUERIES
    from py_sema_spark.session import build_session

    spark = build_session("sf-stepup", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    names = [
        q for fam in args.families.split(",")
        for q in FAMILIES[fam.strip()]
    ]

    tmp = tempfile.mkdtemp(prefix="sf_stepup_", dir=os.path.join(REPO, "BENCH"))
    results: dict = {"k": args.k, "base_sf": args.sf, "cpus": args.cpus,
                     "queries": {}}
    try:
        build_scaled(spark, args.sf, tmp, args.k)

        def timed(name, sf_dir):
            best, rows = None, None
            for _ in range(args.reps):
                t0 = time.time()
                df = QUERIES[name](spark, sf_dir)
                rows = df.count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            return best, rows

        for fam, qs in FAMILIES.items():
            if fam not in args.families:
                continue
            for name in qs:
                t_small, r_small = timed(name, args.sf)
                t_big, r_big = timed(name, tmp)
                rg = (r_big / r_small) if r_small else float("nan")
                tg = t_big / t_small if t_small else float("nan")
                entry = {
                    "family": fam,
                    "sec_base": round(t_small, 2),
                    "sec_10x": round(t_big, 2),
                    "rows_base": r_small,
                    "rows_10x": r_big,
                    "time_growth": round(tg, 2),
                    "row_growth": round(rg, 2),
                    # gate: time growth ≤ 2× max(input growth K, output
                    # row growth) — superlinear means a hidden constant
                    "superlinear": bool(tg > 2 * max(args.k, rg)),
                }
                results["queries"][name] = entry
                print(f"{name}: {entry}", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()

    flagged = [n for n, e in results["queries"].items()
               if e["superlinear"]]
    results["superlinear_flagged"] = flagged
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"flagged": flagged, "out": args.out}))


if __name__ == "__main__":
    main()
