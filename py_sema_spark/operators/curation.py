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

from typing import Iterable, Sequence

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
    # docs with fewer than n tokens emit NO grams (a shorter slice is
    # not an n-gram); without the guard, sequence(0, greatest(sz-n,0))
    # still yields i=0 and the whole short token list leaks out as a
    # bogus sub-n gram
    return (
        toks.select(
            F.col(id_col),
            F.explode(
                F.when(
                    F.size("_toks") >= n,
                    F.transform(
                        F.sequence(F.lit(0), F.size("_toks") - n),
                        lambda i: F.concat_ws(
                            " ", F.slice(F.col("_toks"), i + 1, n)
                        ),
                    ),
                ).otherwise(F.expr("cast(array() as array<string>)"))
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
    def _bound_str(n: int) -> str:
        # 16/16 must keep EVERY row: format(16,'x') is the two-char
        # '10', which lexicographically keeps only keys starting '0';
        # 'g' sorts above every hex char, so `key < 'g'` is always true
        return "g" if n >= 16 else format(n, "x")

    if not 0 <= default_sixteenths <= 16:
        raise ValueError(f"rate out of range: default={default_sixteenths}")
    key = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    bound = F.lit(_bound_str(default_sixteenths))
    for stratum, sixteenths in sorted(rates_sixteenths.items()):
        if not 0 <= sixteenths <= 16:
            raise ValueError(f"rate out of range: {stratum}={sixteenths}")
        bound = F.when(
            F.col(stratum_col) == stratum, F.lit(_bound_str(sixteenths))
        ).otherwise(bound)
    return docs.where(key < bound)


def repetition_metrics(
    docs: DataFrame,
    top_ns: Sequence[int] = (2, 3),
    dup_ns: Sequence[int] = (5,),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1) per doc.

    For each ``n`` in ``top_ns`` the fraction of document characters
    covered by the single most character-covering repeated ``n``-gram
    (``max(count·len(gram)) / len(text)``); for each ``n`` in
    ``dup_ns`` the fraction covered by *all* ``n``-grams occurring
    more than once (``Σ_{count≥2} count·len(gram) / len(text)``).
    Occurrences are counted independently (overlaps are not collapsed
    — a deterministic simplification of Gopher's character-coverage
    accounting, identical on both engine and oracle).

    Scale shape: one explode pass emits every (n, gram) occurrence —
    Σ_n (L−n+1) rows per doc, linear in document length (never the
    O(L²) per-row ``filter``-within-``transform`` form). The
    occurrence count groups on high-cardinality ``(doc_id, n, gram)``
    with map-side combine, then one per-doc combine; both exchanges
    are skew-free because the key includes ``doc_id``.
    """
    ns = sorted({*top_ns, *dup_ns})
    toks = docs.select(
        F.col(id_col),
        F.length(text_col).alias("_dl"),
        normalized_tokens(F.col(text_col)).alias("_toks"),
    )

    def gram_at(n: int):
        # single-arg lambda on purpose: a two-arg lambda would be
        # treated by F.transform as (element, index)
        return lambda i: F.struct(
            F.lit(n).alias("n"),
            F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, n)).alias(
                "gram"
            ),
        )

    per_n = [
        F.when(
            F.size("_toks") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - n), gram_at(n)
            ),
        ).otherwise(F.array().cast("array<struct<n:int,gram:string>>"))
        for n in ns
    ]
    occurrences = toks.select(
        F.col(id_col),
        "_dl",
        F.explode(F.flatten(F.array(*per_n))).alias("_g"),
    ).select(id_col, "_dl", "_g.n", "_g.gram")
    counts = occurrences.groupBy(id_col, "_dl", "n", "gram").agg(
        F.count(F.lit(1)).alias("_c")
    )
    covered = F.col("_c") * F.length("gram")
    aggs = []
    for n in top_ns:
        # repeated grams only (count >= 2): a doc whose n-grams are all
        # unique has zero repetition signal, not len(longest gram)/len
        aggs.append(
            F.max(
                F.when((F.col("n") == n) & (F.col("_c") >= 2), covered)
            ).alias(f"_top{n}")
        )
    for n in dup_ns:
        aggs.append(
            F.sum(
                F.when((F.col("n") == n) & (F.col("_c") >= 2), covered)
            ).alias(f"_dup{n}")
        )
    per_doc = counts.groupBy(id_col, "_dl").agg(*aggs)
    denom = F.greatest(F.col("_dl"), F.lit(1))
    out_cols = [F.col(id_col)]
    for n in top_ns:
        out_cols.append(
            (F.coalesce(f"_top{n}", F.lit(0)) / denom).alias(
                f"top{n}gram_char_frac"
            )
        )
    for n in dup_ns:
        out_cols.append(
            (F.coalesce(f"_dup{n}", F.lit(0)) / denom).alias(
                f"dup{n}gram_char_frac"
            )
        )
    return (
        docs.select(id_col, F.length(text_col).alias("_dl"))
        .join(per_doc, [id_col, "_dl"], "left")
        .select(*out_cols)
    )


def domain_cap(
    docs: DataFrame,
    k: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Keep at most ``k`` documents per domain (RefinedWeb-style
    site-level cap against SEO farms / crawler traps).

    Survivors are chosen deterministically: rank by
    ``md5(salt | doc_id)`` inside each domain (a uniform, retry-stable
    shuffle of the domain's docs) and keep ranks ≤ k.

    Scale shape: the rank filter compiles to Spark's
    ``WindowGroupLimit`` — each map task pre-truncates its partition
    to the top-k per domain *before* the exchange, so a crawler-trap
    domain with 10⁹ pages ships only ``k`` rows per upstream
    partition instead of 10⁹ rows to one reducer.
    """
    key = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(domain_col).orderBy(key.asc(), F.col(id_col))
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def blocklist_filter(
    docs: DataFrame,
    blocked: DataFrame | Iterable[str],
    domain_col: str = "source",
) -> DataFrame:
    """Drop documents whose domain appears on a blocklist.

    Blocklists (UT1-style adult/malware domain lists) are ~10⁶ rows —
    broadcast territory — so this is a map-side anti-join: zero
    shuffle of the corpus at any corpus size.
    """
    spark = docs.sparkSession
    if not isinstance(blocked, DataFrame):
        blocked = spark.createDataFrame(
            [(d,) for d in sorted(set(blocked))], f"{domain_col} string"
        )
    blocked = blocked.select(domain_col).distinct()
    return docs.join(F.broadcast(blocked), domain_col, "left_anti")


def domain_stats(
    docs: DataFrame,
    domain_col: str = "source",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Per-domain corpus profile: document count, total/mean chars.

    One hash aggregation keyed on the domain (partial map-side
    combine); mean is emitted as the single division
    ``total/count`` so the DuckDB oracle is IEEE-identical.
    """
    return docs.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(chars_col).alias("total_chars"),
        (F.sum(chars_col) / F.count(F.lit(1))).alias("mean_chars"),
    )


def bigram_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc bigram occurrences ``(doc_id, w1, w2)`` — one narrow
    explode over adjacent normalized-token pairs."""
    toks = docs.select(
        F.col(id_col), normalized_tokens(F.col(text_col)).alias("_toks")
    )
    return toks.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("_toks") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("_toks") - 2),
                    lambda i: F.struct(
                        F.element_at("_toks", i + 1).alias("w1"),
                        F.element_at("_toks", i + 2).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("_b"),
    ).select(id_col, "_b.w1", "_b.w2")


def lm_score(
    docs: DataFrame,
    train: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style language-model quality score: mean log-probability
    of each document's token bigrams under an add-``k``-smoothed
    bigram model estimated from ``train`` (e.g. a trusted high-quality
    slice). Low scores flag gibberish / boilerplate / wrong-language
    docs; CCNet buckets a corpus into head/middle/tail on exactly this
    statistic (Wenzek et al. 2020 §4.3, with KenLM as the model).

    ``P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V)``, ``V`` = train
    vocabulary size; unseen bigrams/unigrams fall back to the smoothed
    floor. Returns ``(doc_id, n_bigrams, lm_logprob)`` with the score
    rounded to 6 decimals (absorbs float-summation-order noise so the
    DuckDB oracle is exact); docs with <2 tokens score NULL.

    Scale shape: training is two hash aggregations with map-side
    combine (bigram + unigram counts — the classic Zipf skew
    *pre-aggregates*, so ``the the`` never concentrates on a reducer).
    Scoring joins the doc-bigram explode against the counts on their
    natural keys; ``V`` attaches as a broadcast single-row frame, not
    a driver-side collect.
    """
    tr_bi = bigram_counts(train, text_col, id_col)
    bi = tr_bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_cb"))
    uni = (
        train.select(
            F.explode(normalized_tokens(F.col(text_col))).alias("w1")
        )
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("_cu"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("_v"))
    scored = (
        bigram_counts(docs, text_col, id_col)
        .join(bi, ["w1", "w2"], "left")
        .join(uni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce("_cb", F.lit(0)) + k)
                / (F.coalesce("_cu", F.lit(0)) + k * F.col("_v"))
            ).alias("_lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("_lp"), 6).alias("lm_logprob"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "lm_logprob",
        )
    )


def lm_buckets(
    docs: DataFrame,
    train: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    stratum_col: str = "lang",
) -> DataFrame:
    """CCNet head/middle/tail corpus split: per language, bucket docs
    by their :func:`lm_score` tercile (Wenzek et al. 2020 §4.3 —
    head ≈ best third under the reference LM, tail ≈ worst).

    Returns ``(doc_id, <stratum>, bucket)`` with bucket ∈
    head/middle/tail; docs too short to score land in ``tail``.

    Scale shape: NOT an ``ntile`` over each language (that is one
    reducer per language sorting the whole corpus). Instead scores are
    rounded (already round-6 from :func:`lm_score`) and aggregated to
    ``(lang, score) → count`` — a map-side-combining hash agg — and
    the tercile thresholds come from a running sum over the *distinct
    score values* per language, whose cardinality is bounded by the
    rounded value space (≤ ~2.5·10⁷ rows regardless of corpus size).
    Bucket assignment is then a join back on ``(lang, score)`` with
    pure integer comparisons (``3·cum ≤ total``), so the DuckDB
    oracle is exact.
    """
    # materialize the per-doc scores once: strata/counts/thresholds all
    # reuse this frame, and without the lineage cut Catalyst re-executes
    # the full bigram-model subtree (two explodes + three joins) for
    # every window branch — measured 12× slower at sf0.01
    scored = lm_score(docs, train, k, text_col, id_col).localCheckpoint(
        eager=False
    )
    strata = docs.select(id_col, stratum_col).join(scored, id_col)
    counts = (
        strata.where(F.col("lm_logprob").isNotNull())
        .groupBy(stratum_col, "lm_logprob")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w_cum = Window.partitionBy(stratum_col).orderBy(
        F.desc("lm_logprob")
    )  # RANGE frame: tied scores share one cumulative value
    w_all = Window.partitionBy(stratum_col)
    th = counts.select(
        stratum_col,
        "lm_logprob",
        F.when(
            3 * F.sum("_c").over(w_cum) <= F.sum("_c").over(w_all), "head"
        )
        .when(
            3 * F.sum("_c").over(w_cum) <= 2 * F.sum("_c").over(w_all),
            "middle",
        )
        .otherwise("tail")
        .alias("bucket"),
    )
    return strata.join(th, [stratum_col, "lm_logprob"], "left").select(
        id_col,
        stratum_col,
        F.coalesce("bucket", F.lit("tail")).alias("bucket"),
    )


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
    # chunk key must respect the id ORDER (chunk boundaries are range
    # boundaries): numeric ids bucket by value; string ids bucket by
    # a 2-char prefix, which respects lexicographic order. A numeric
    # division on a string id would cast to NULL and the offsets
    # equi-join would silently return zero rows.
    id_type = dict(docs.dtypes)[id_col]
    if id_type in ("string", "binary"):
        chunk_key = F.substring(F.col(id_col).cast("string"), 1, 2)
    else:
        chunk_key = (F.col(id_col) / chunk).cast("bigint")
    toks = docs.select(
        F.col(id_col),
        F.size(normalized_tokens(F.col(text_col))).alias("n_tokens"),
        chunk_key.alias("_chunk"),
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


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 128,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size token windows (the
    context-window chunking step before tokenization/packing in an
    LLM training pipeline, and the passage chunking step in a
    retrieval pipeline).

    Emits ``(doc_id, chunk_id, chunk_text, n_tokens)`` with chunks of
    ``max_tokens`` tokens advancing by ``max_tokens − overlap``; the
    final partial chunk is kept. Pure column algebra (tokenize once,
    slice by index) — a narrow map, no shuffle, no Python.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    toks = docs.select(
        F.col(id_col), normalized_tokens(F.col(text_col)).alias("_toks")
    )
    n_chunks = F.when(
        F.size("_toks") <= 0, F.lit(0)
    ).otherwise(
        F.floor((F.greatest(F.size("_toks") - overlap, F.lit(1)) - 1) / step)
        + 1
    )
    chunks = toks.select(
        F.col(id_col),
        F.posexplode(
            # guard: Spark's sequence(1, 0) is the DESCENDING [1, 0],
            # not empty — an empty doc must yield zero chunks
            F.when(
                n_chunks > 0,
                F.transform(
                    F.sequence(F.lit(1), n_chunks.cast("int")),
                    lambda c: F.slice(
                        F.col("_toks"), (c - 1) * step + 1, max_tokens
                    ),
                ),
            ).otherwise(F.array().cast("array<array<string>>"))
        ).alias("chunk_id", "_ctoks"),
    )
    return chunks.select(
        id_col,
        "chunk_id",
        F.concat_ws(" ", "_ctoks").alias("chunk_text"),
        F.size("_ctoks").alias("n_tokens"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document:
    ``score = tf · ln(N / df)`` over normalized tokens, ties broken by
    term. The rank is taken over the score **rounded to 6 decimals**:
    IEEE 754 does not require a correctly-rounded ``log``, so two
    mathematically-equal scores reached from *different* (tf, df)
    pairs (e.g. 2·ln16 vs 4·ln4) can straddle 1 ulp differently on the
    JVM vs another engine; rounding first turns them into exact ties
    that the term tiebreak then resolves identically everywhere.

    Scale shape: tf = hash agg on (doc, term) with map-side combine;
    df = hash agg on term (Zipf hubs pre-combine); N attaches as a
    broadcast 1-row frame; the per-doc rank filter compiles to
    WindowGroupLimit.
    """
    terms = docs.select(
        F.col(id_col),
        F.explode(normalized_tokens(F.col(text_col))).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_ = terms.select(id_col, "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_df = F.broadcast(
        docs.select(id_col).agg(F.count(F.lit(1)).alias("_n"))
    )
    scored = (
        tf.join(df_, "term")
        .crossJoin(n_df)
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("_n") / F.col("df")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select(
            id_col,
            "term",
            F.col("_rk").alias("rank"),
            "score",
        )
    )


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Build the term → postings inverted index — the retrieval-side
    artifact of a corpus pipeline (BM25 serving, corpus search,
    decontamination lookups all start here).

    Returns ``(token, df, total_tf, postings)`` where ``postings`` is
    the canonical ``"doc:tf,doc:tf,…"`` string sorted by doc id — a
    deterministic, engine-portable serialization (an array<struct>
    output would compare differently across engines; the string form
    is bit-stable and is also what an external index loader ingests).

    Scale shape: explode → **two nested hash aggs** ((token, doc) tf,
    then per-token rollup), both map-side combining; Zipf-skewed hub
    tokens ("the") pre-aggregate per partition before the exchange.
    The per-token postings list is the one genuinely unbounded object
    — ``min_df`` prunes hapax noise, and a production index shards
    postings by doc-range bucket (the same ``with_subject_bucket``
    salting model.py applies to hub subjects); here the list stays
    whole because the fixture vocabulary is bounded.
    """
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(normalized_tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "tf"))
                    ),
                    lambda x: F.concat_ws(
                        ":",
                        x["doc_id"].cast("string"),
                        x["tf"].cast("string"),
                    ),
                ),
                ",",
            ).alias("postings"),
        )
        .where(F.col("df") >= min_df)
    )


def bm25_score(
    docs: DataFrame,
    terms: list,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranking for a fixed query-term set — the scoring half of
    the retrieval pair started by :func:`inverted_index` (Robertson/
    Sparck Jones idf ``ln(1 + (N-df+0.5)/(df+0.5))``, tf saturation
    ``k1``, length normalization ``b``).

    Returns the ``top_k`` documents as ``(doc_id, score)`` ordered by
    (score desc, doc_id) — a deterministic total order. Per-term
    contributions are rounded to 8 decimals before the per-doc sum and
    the sum to 6, so the two float-nonassociative points are pinned
    for the cross-engine oracle; everything upstream is integer.

    Scale shape: the corpus scans once (tokens + per-doc length in one
    projection); the tf filter keeps only query-term rows *before* any
    exchange, so the hash aggs work on |terms|-bounded data; N and
    avg-length ride as a broadcast one-row frame (no collect); final
    top-k is TakeOrdered. At serving scale the df/N constants come
    from the materialized inverted index instead of a corpus pass —
    same expression, precomputed inputs.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        normalized_tokens(F.col(text_col)).alias("_toks"),
    )
    toks = base.select(
        "doc_id", F.size("_toks").alias("dl"), F.explode("_toks").alias("token")
    )
    # N and avgdl are COLLECTION constants (Robertson/Sparck Jones):
    # zero-token docs count toward both — computing them post-explode
    # would silently shrink N and inflate every idf
    stats = F.broadcast(
        base.agg(
            F.count(F.lit(1)).alias("_N"),
            F.avg(F.size("_toks")).alias("_avgdl"),
        )
    )
    qt = toks.where(F.col("token").isin(list(terms)))
    tf = qt.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    df_t = F.broadcast(
        tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_N") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        1 - b + b * F.col("dl") / F.col("_avgdl")
    )
    per_term = tf.join(df_t, "token").crossJoin(stats).select(
        "doc_id",
        F.round(idf * (F.col("tf") * (k1 + 1)) / denom, 8).alias("_s"),
    )
    return (
        per_term.groupBy("doc_id")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(top_k)
    )


def length_outlier_filter(
    docs: DataFrame,
    value_col: str = "n_chars",
    group_cols: list | None = None,
    lo: float = 0.01,
    hi: float = 0.99,
    id_col: str = "doc_id",
) -> DataFrame:
    """Percentile-band outlier removal — the standard curation gate
    for truncated/boilerplate (too short) and concatenation-glitch
    (too long) documents, computed per group (usually per language —
    absolute thresholds misfire across scripts).

    Keeps rows with ``p_lo <= value <= p_hi`` within their group and
    returns them with the band attached (``p_lo``, ``p_hi``).

    Scale shape: one hash agg for the per-group band
    (:func:`..sketch.exact_quantiles` — swap `percentile_approx` in at
    100 TB, same call shape), then a **broadcast** join back (bands
    are one row per group, bounded by group cardinality); the corpus
    itself never shuffles.
    """
    from .sketch import exact_quantiles

    groups = list(group_cols or [])
    bands = exact_quantiles(docs, value_col, groups, (lo, hi))
    pl = f"p{str(lo)[2:].ljust(2, '0')}"
    ph = f"p{str(hi)[2:].ljust(2, '0')}"
    bands = bands.select(
        *groups, F.col(pl).alias("p_lo"), F.col(ph).alias("p_hi")
    )
    joined = (
        docs.join(F.broadcast(bands), groups)
        if groups
        else docs.crossJoin(F.broadcast(bands))
    )
    return joined.where(
        (F.col(value_col) >= F.col("p_lo"))
        & (F.col(value_col) <= F.col("p_hi"))
    )


def temperature_rebalance(
    docs: DataFrame,
    temperature: float = 0.5,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "t0",
) -> DataFrame:
    """Temperature-flattened group rebalancing — the multilingual
    training-mix move (CCNet / mT5-style): sample group g at rate
    ``(n_g / n_min)^(τ−1)``, so with τ<1 the biggest groups are
    downsampled hardest, the rarest group keeps every row, and the
    kept counts approach ∝ n_g^τ.

    Membership is the same deterministic no-rand() hash test as
    :func:`stratified_sample` (md5 of salt|id → uniform in [0,1)),
    so retries/speculation/partitioning can't change the sample; the
    rate table is a tiny broadcast join (one groupBy over the corpus
    to learn counts — the only exchange). Rates are rounded to 6
    before the compare so the Spark and SQL ``pow`` agree bit-for-bit
    on the boundary.
    """
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    mn = F.broadcast(counts.agg(F.min("_n").alias("_mn")))
    rates = F.broadcast(
        counts.crossJoin(mn).select(
            group_col,
            F.round(
                F.pow(
                    F.col("_n").cast("double") / F.col("_mn"),
                    F.lit(temperature - 1.0),
                ),
                6,
            ).alias("_rate"),
        )
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit(salt), F.col(id_col).cast("string")
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4503599627370496.0)  # 2^52
    )
    # null-safe join: a NULL group (e.g. language-ID abstained) is a
    # group like any other — groupBy already counted it, and a plain
    # equi-join would silently drop every NULL-group row while its
    # count could still set n_min and deflate all real groups' rates
    r = rates.withColumnRenamed(group_col, "_rg")
    return (
        docs.join(
            F.broadcast(r), F.col(group_col).eqNullSafe(F.col("_rg"))
        )
        .where(u < F.col("_rate"))
        .select(*docs.columns)
    )


def negative_samples(
    ids: DataFrame,
    positives: DataFrame | None = None,
    k: int = 3,
    id_col: str = "doc_id",
    salt: str = "n0",
) -> DataFrame:
    """Deterministic negative-pair sampling for contrastive training:
    each id draws ``k`` pseudo-random partners, self-pairs drop,
    pairs normalize to (a < b), and known positives (a two-column
    frame) anti-join away. No ``rand()`` anywhere — partner choice is
    md5(salt|index|draw) mod n, so retries, speculation, and
    repartitioning reproduce the exact pair set (the property that
    keeps a 10^12-row training manifest rebuildable).

    Plan: one window ranks ids into a dense 0..n-1 index (at real
    scale the corpus already carries one — pass precomputed ids and
    the window folds away), one explode (k rows per id), one join
    back index→id, one anti-join. All joins are on uniform keys.

    Returns distinct ``(a, b)`` id pairs.
    """
    from pyspark.sql import Window

    base = ids.select(F.col(id_col).alias("_id")).distinct()
    idx = base.withColumn(
        "_ix", F.row_number().over(Window.orderBy("_id")) - 1
    )
    n_df = F.broadcast(idx.agg(F.count(F.lit(1)).alias("_n")))
    drawn = (
        idx.crossJoin(n_df)
        .select(
            "_id",
            "_ix",
            "_n",
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("_j"),
        )
        .withColumn(
            "_pix",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.lit(salt),
                            F.col("_ix").cast("string"),
                            F.col("_j").cast("string"),
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")
            % F.col("_n"),
        )
    )
    paired = (
        drawn.join(
            idx.select(
                F.col("_ix").alias("_pix"), F.col("_id").alias("_pid")
            ),
            "_pix",
        )
        .where(F.col("_id") != F.col("_pid"))
        .select(
            F.least("_id", "_pid").alias("a"),
            F.greatest("_id", "_pid").alias("b"),
        )
        .distinct()
    )
    if positives is not None:
        pa, pb = positives.columns[:2]
        pos = positives.select(
            F.least(F.col(pa), F.col(pb)).alias("a"),
            F.greatest(F.col(pa), F.col(pb)).alias("b"),
        ).distinct()
        paired = paired.join(pos, ["a", "b"], "left_anti")
    return paired


def quality_audit(
    df: DataFrame, rules: dict[str, F.Column]
) -> DataFrame:
    """Data-quality audit: ``rules`` maps rule name → boolean Column
    that should hold for every row; returns one row per rule with
    ``(rule, violations, total, pass_rate)`` — the pipeline QA gate a
    production ingest runs before promoting a snapshot (the
    relational cousin of the SHACL report in `shacl.py`: same
    shape, column predicates instead of shapes).

    ONE scan regardless of rule count: every rule compiles to a
    conditional-count aggregate over the same pass (NULL counts as a
    violation — an unknown value never silently passes), then a tiny
    unpivot. pass_rate is rounded to 6.
    """
    if not rules:
        raise ValueError("quality_audit needs at least one rule")
    aggs = []
    for name, col in rules.items():
        aggs.append(
            # coalesce(sum, 0): over an EMPTY frame sum is NULL, and a
            # NULL violation count would read as "no violations"
            F.coalesce(
                F.sum(
                    F.when(F.coalesce(col, F.lit(False)), 0).otherwise(1)
                ),
                F.lit(0),
            ).alias(f"_v_{name}")
        )
    aggs.append(F.count(F.lit(1)).alias("_total"))
    wide = df.agg(*aggs)
    parts = []
    for name in rules:
        parts.append(
            wide.select(
                F.lit(name).alias("rule"),
                F.col(f"_v_{name}").alias("violations"),
                F.col("_total").alias("total"),
                F.round(
                    F.when(
                        F.col("_total") > 0,
                        (F.col("_total") - F.col(f"_v_{name}"))
                        / F.col("_total"),
                    ).otherwise(F.lit(1.0)),
                    6,
                ).alias("pass_rate"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 64,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every raw document by how target-like its hashed unigram
    bag is, ``log w(x) = Σ_tokens log p_target(b(t)) / p_raw(b(t))``,
    where ``b`` hashes tokens into ``n_buckets`` and both bucket
    distributions are add-``alpha`` smoothed. Sampling raw data
    proportionally to ``w`` approximates sampling from the target
    domain — the standard pretraining-mixture curation step between
    dedup and tokenization.

    Returns ``(doc_id, n_tokens, dsir_logweight)`` for every doc in
    ``docs`` (0-token docs score 0.0). The hash is md5-prefix → int —
    portable to the ANSI-SQL oracle.

    Scale shape: both distributions are hash aggregates over the
    token explode with map-side combine into ``n_buckets`` groups; the
    per-bucket log-ratio table is ≤``n_buckets`` rows → broadcast
    join onto the scoring explode, then one doc-keyed sum. The raw
    corpus is scanned twice (estimate + score) — at 10^12 docs the
    estimate pass would subsample (the distribution needs only a
    sketch), which changes constants, not shape.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10)
        .cast("long") % n_buckets
    ).alias("b")
    raw_toks = docs.select(
        F.col(id_col),
        F.explode(normalized_tokens(F.col(text_col))).alias("token"),
    ).select(id_col, bucket)
    tgt_toks = target.select(
        F.explode(normalized_tokens(F.col(text_col))).alias("token")
    ).select(bucket)
    rcnt = raw_toks.groupBy("b").agg(F.count(F.lit(1)).alias("_rc"))
    tcnt = tgt_toks.groupBy("b").agg(F.count(F.lit(1)).alias("_tc"))
    rtot = rcnt.agg(F.sum("_rc").alias("_rt"))
    ttot = tcnt.agg(F.sum("_tc").alias("_tt"))
    aB = float(alpha) * n_buckets
    ratios = (
        rcnt.join(tcnt, "b", "left")
        .crossJoin(F.broadcast(rtot))
        .crossJoin(F.broadcast(ttot))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce("_tc", F.lit(0)) + alpha)
                    / (F.col("_tt") + aB)
                )
                - F.log((F.col("_rc") + alpha) / (F.col("_rt") + aB))
            ).alias("_lr"),
        )
    )
    scored = (
        raw_toks.join(F.broadcast(ratios), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("_lr"), 6).alias("dsir_logweight"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("dsir_logweight", F.lit(0.0)).alias("dsir_logweight"),
        )
    )
