"""Corpus-curation operators for training-data pipelines: benchmark
decontamination, deterministic stratified sampling, and token-budget
shard packing.

These extend the reference's data-preparation surface (the brief's
"operations a large-scale training-data pipeline would need") with the
three curation stages every LLM pre-training pipeline runs between
dedup and tokenization:

1. **Decontamination** — drop/flag training documents that share long
   word n-grams with an evaluation benchmark (the GPT-3/PaLM 13-gram
   protocol). The benchmark set is tiny relative to the corpus, so its
   n-gram set is a *broadcast* side — the corpus-side scan never
   shuffles.
2. **Stratified hash sampling** — per-stratum Bernoulli sampling keyed
   on ``md5(salt | doc_id)``: deterministic (reruns pick the same
   rows; no ``rand()`` so retried tasks can't flip membership), and a
   pure narrow map — zero shuffles at any scale.
3. **Token-budget packing** — assign documents to fixed-token-budget
   training shards by running token count. A naive global window is a
   single-partition bottleneck; this is the standard two-pass
   distributed prefix-sum (per-chunk totals → tiny broadcast prefix
   table → per-chunk local window), the same shape GraphFrames-era
   prefix scans use at 10^12 rows.

Everything is column algebra (no Python in the hot path) and every
semantic hash is md5-over-string so the DuckDB oracle mirrors it
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalized_tokens


def word_ngrams(
    docs: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct (id, gram) word n-grams — map-side explode, JVM-only.

    Same construction as :func:`.dedup.ngram_jaccard_pairs` (tokenize
    once per row, slice by index) so Spark and the SQL oracle agree on
    gram boundaries.
    """
    toks = docs.select(
        F.col(id_col), normalized_tokens(F.col(text_col)).alias("_toks")
    )
    return (
        toks.select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0), F.greatest(F.size("_toks") - n, F.lit(0))
                    ),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("_toks"), i + 1, n)
                    ),
                )
            ).alias("gram"),
        )
        .where(F.length("gram") > 0)
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag training docs sharing any word ``n``-gram with a benchmark.

    Returns every input doc as ``(doc_id, n_hits, contaminated)`` where
    ``n_hits`` counts the doc's *distinct* n-grams that appear anywhere
    in the benchmark set.

    Scale shape: the benchmark n-gram set (eval suites are ~10⁴–10⁶
    grams) is broadcast; the corpus side is explode → broadcast
    semi-join → partial-agg count — the only exchange is the final
    per-doc count combine, keyed on high-cardinality doc_id. No
    corpus×corpus join exists anywhere.
    """
    doc_grams = word_ngrams(docs, n, text_col, id_col)
    bench_grams = (
        word_ngrams(benchmark, n, text_col, id_col)
        .select("gram")
        .distinct()
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    rates_sixteenths: dict[str, int],
    default_sixteenths: int = 4,
    salt: str = "s0",
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample.

    A row survives iff ``md5(salt | id) < bound(stratum)`` where the
    bound is the single hex digit ``rate·16`` — md5 hex digits are
    uniform, so a bound of ``'8'`` keeps 8/16 = 50%. Lexicographic
    hex-string comparison is identical in Spark and DuckDB, which keeps
    the oracle exact without any hex→int conversion.

    Properties that matter at 10^12 rows: no ``rand()`` (task retries
    and speculative duplicates can't change membership), no shuffle
    (pure filter — Catalyst pushes it into the scan), and the sample is
    stable under corpus re-partitioning because the key depends only on
    row identity.
    """
    key = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    bound = F.lit(format(default_sixteenths, "x"))
    for stratum, sixteenths in sorted(rates_sixteenths.items()):
        if not 0 <= sixteenths <= 16:
            raise ValueError(f"rate out of range: {stratum}={sixteenths}")
        bound = F.when(
            F.col(stratum_col) == stratum, F.lit(format(sixteenths, "x"))
        ).otherwise(bound)
    return docs.where(key < bound)


def token_budget_pack(
    docs: DataFrame,
    budget: int,
    chunk: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign docs to fixed-token-budget shards by running token count.

    ``shard_id = floor(prefix_tokens_before_doc / budget)`` over docs
    ordered by ``doc_id`` — the deterministic sequential-fill packing
    used to cut a curated corpus into training shards.

    A single global running sum is a one-partition window — the
    classic scale bug. This is the two-pass distributed prefix sum:

    1. bucket rows into ``chunk``-sized id ranges and window *within*
       each chunk (parallel across chunks);
    2. aggregate one total per chunk (tiny: |corpus|/chunk rows),
       prefix-sum THAT on the single-partition window (fine — it's
       ~10⁶ rows at 10^12 docs), and broadcast-join the chunk offsets
       back.

    Returns (doc_id, n_tokens, shard_id).
    """
    toks = docs.select(
        F.col(id_col),
        F.size(normalized_tokens(F.col(text_col))).alias("n_tokens"),
        (F.col(id_col) / chunk).cast("bigint").alias("_chunk"),
    )
    in_chunk = Window.partitionBy("_chunk").orderBy(id_col)
    local = toks.withColumn(
        "_local_prefix",
        F.sum("n_tokens").over(in_chunk) - F.col("n_tokens"),
    )
    chunk_totals = toks.groupBy("_chunk").agg(
        F.sum("n_tokens").alias("_chunk_total")
    )
    chunk_order = Window.orderBy("_chunk")
    offsets = chunk_totals.withColumn(
        "_chunk_offset",
        F.coalesce(
            F.sum("_chunk_total").over(chunk_order) - F.col("_chunk_total"),
            F.lit(0),
        ),
    ).select("_chunk", "_chunk_offset")
    return (
        local.join(F.broadcast(offsets), "_chunk")
        .select(
            F.col(id_col),
            "n_tokens",
            F.floor(
                (F.col("_chunk_offset") + F.col("_local_prefix"))
                / F.lit(budget)
            )
            .cast("int")
            .alias("shard_id"),
        )
    )
