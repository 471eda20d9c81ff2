"""Structured-Streaming front-end for the extraction pipeline.

The reference is batch with explicit *freshness* semantics
(SURVEY.md §2.9: graph max-age gates, mtime-diff syncing). The
streaming analog: new corpus files land in a directory → incremental
extraction → append-only triples sink, with exactly-once bookkeeping
from the checkpoint. ``Trigger.AvailableNow`` drains the backlog and
stops — the batch-compatible mode the survey prescribes; leaving
``available_now=False`` runs continuously for a live feed.

The extraction stage is stateless ``mapInPandas``, so the same
`extract_structured` code serves batch and stream unchanged. The
watermarked per-window page counts (:func:`windowed_page_counts`)
are the T1-style freshness rollup — late pages beyond the watermark
are dropped deterministically.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import CORPUS_SCHEMA, skolemize
from .operators.extract import extract_structured, triples_of


def stream_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """File-arrival stream of corpus parquet (one file = one
    micro-batch unit; schema fixed per input_hint)."""
    return (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(corpus_dir)
    )


def stream_extract_triples(corpus_stream: DataFrame) -> DataFrame:
    return skolemize(triples_of(extract_structured(corpus_stream)))


def _start_parquet_sink(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool,
    timeout_s: Optional[float],
):
    """Shared append-parquet sink: AvailableNow drains the backlog and
    blocks up to ``timeout_s``; otherwise runs continuously."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination(timeout_s)
        return query
    return writer.start()


def run_extraction_stream(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    timeout_s: Optional[float] = 300,
):
    """corpus dir → triples parquet, incrementally, resumable from the
    streaming checkpoint (the stream-shaped variant of the pipeline's
    stage markers)."""
    triples = stream_extract_triples(stream_corpus(spark, corpus_dir))
    return _start_parquet_sink(
        triples, out_dir, checkpoint_dir, available_now, timeout_s
    )


def run_kg_stream(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    timeout_s: Optional[float] = 300,
    dedup_ttl_s: Optional[int] = None,
):
    """End-to-end streaming KG construction: corpus file stream →
    Arrow-batched extraction → skolemize → **stateful global triple
    dedup** (:func:`stream_unique_filter` on the full triple key, so a
    triple re-extracted in a later micro-batch — or after a restart —
    is emitted exactly once; state lives in the checkpoint) → append
    triples sink.

    This is the streaming twin of ``Pipeline.run``'s batch
    extract→dedup spine: same extraction code (stateless mapInPandas
    serves both), with the batch dedup exchange replaced by keyed
    state. ``dedup_ttl_s`` bounds state for unbounded feeds (the
    10^12-row trade documented on :func:`stream_unique_filter`).
    """
    triples = stream_extract_triples(stream_corpus(spark, corpus_dir))
    deduped = stream_unique_filter(
        triples,
        ["s", "p", "o", "o_kind", "o_datatype", "o_lang"],
        state_timeout_s=dedup_ttl_s,
    )
    return _start_parquet_sink(
        deduped, out_dir, checkpoint_dir, available_now, timeout_s
    )


def windowed_page_counts(
    corpus_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window rollup: pages per (crawl-hour,
    lang). Late rows beyond the watermark are dropped deterministically
    — the streaming form of the reference's freshness gates (T1/T2),
    and the per-window lineage row source for a live ingest."""
    return (
        corpus_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("lang"))
        .agg(F.count("*").alias("cnt"))
    )


def stream_unique_filter(
    stream: DataFrame,
    key_cols,
    state_timeout_s: Optional[int] = None,
) -> DataFrame:
    """Streaming first-per-key dedup with *explicit* state —
    ``applyInPandasWithState`` (the unique-pattern filter F1 /
    ``dropDuplicates`` in stream form, but with inspectable,
    checkpoint-restored state and an optional per-key TTL).

    Semantics: the first row ever seen for a key (across micro-batches
    AND across restarts — state lives in the checkpoint) is emitted;
    later rows only bump the key's count. With ``state_timeout_s`` a
    key whose state idles past the TTL is forgotten, so the same key
    re-emits — the bounded-memory trade every 10^12-row streaming
    dedup must make (exact forever-state does not fit; TTL windows
    bound it).

    Rows within one batch keep their first occurrence by the order
    Spark delivers the group's batch iterator (file order under the
    file source).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_cols = list(key_cols)
    out_schema = stream.schema
    state_schema = "seen bigint"

    def dedup(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # TTL expiry callback: forget the key entirely
            state.remove()
            yield pd.DataFrame(
                columns=[f.name for f in out_schema.fields]
            )
            return
        seen = state.get[0] if state.exists else 0
        first = None
        n_new = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            if seen == 0 and n_new == 0:
                first = pdf.iloc[[0]]
            n_new += len(pdf)
        state.update((seen + n_new,))
        if state_timeout_s is not None:
            state.setTimeoutDuration(state_timeout_s * 1000)
        if first is not None:
            yield first
        else:
            yield pd.DataFrame(columns=[f.name for f in out_schema.fields])

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_timeout_s is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(*[F.col(c) for c in key_cols]).applyInPandasWithState(
        dedup, out_schema, state_schema, "append", timeout
    )


def run_curation_stream(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    timeout_s: Optional[float] = 300,
    dedup_ttl_s: Optional[int] = None,
    min_words: int = 5,
    min_stop_hits: int = 0,
    schema=None,
):
    """Streaming corpus curation: documents file stream → Gopher-rule
    quality gate → **stateful cross-batch exact dedup** on the content
    hash → append sink.

    The streaming twin of the batch curation spine (quality filter →
    :func:`..operators.dedup.incremental_exact_dedup`): a document
    arriving in a later micro-batch — or after a restart — with text
    already admitted is dropped by checkpointed state rather than by
    an ever-growing anti-join side. The quality gate is stateless
    column algebra, so it rides inside the same micro-batch plan with
    no extra shuffle; the only stateful exchange is keyed on the
    uniform md5 hash. ``dedup_ttl_s`` bounds state for unbounded
    feeds (see :func:`stream_unique_filter`).
    """
    from .functions.text import gopher_pass

    # a fixed schema lets the stream start before any file has landed
    # (the normal deploy order); inference needs at least one file
    if schema is None:
        schema = spark.read.parquet(docs_dir).schema
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(docs_dir)
    )
    passed = docs.where(
        gopher_pass(
            F.col("text"), min_words=min_words, min_stop_hits=min_stop_hits
        )
    ).withColumn("content_hash", F.md5("text"))
    deduped = stream_unique_filter(
        passed, ["content_hash"], state_timeout_s=dedup_ttl_s
    )
    return _start_parquet_sink(
        deduped, out_dir, checkpoint_dir, available_now, timeout_s
    )


def stream_sessionize(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    id_col: str = "event_id",
):
    """Streaming gap-based sessionization — the stateful twin of
    :func:`..operators.windows.sessionize`: per-key state carries
    ``(last event epoch-µs, session counter)`` across micro-batches
    and restarts, so a user's session numbering continues exactly
    where the previous batch (or the pre-crash run) left off.

    Emits every event with ``is_session_start`` and the same
    deterministic ``<user>#<n>`` session ids as the batch operator —
    the batch twin is the correctness oracle in tests.

    Ordering contract: events are sorted by ``ts`` *within* each
    micro-batch group; cross-batch order is arrival order (file order
    under the file source). For out-of-order feeds put a watermarked
    sort upstream or widen ``gap_minutes`` — the standard trade;
    Spark's own session windows make the same assumption outside
    event-time mode. State is two longs per active user — bounded by
    the live-user set, not history.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        BooleanType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        list(stream.schema.fields)
        + [
            StructField("is_session_start", BooleanType()),
            StructField("session_id", StringType()),
        ]
    )
    state_schema = "last_us bigint, sess bigint"
    gap_us = gap_minutes * 60_000_000
    in_cols = [f.name for f in stream.schema.fields]
    # tie-break equal timestamps on the id column (when present) so
    # batch parity holds: operators/windows.sessionize orders by
    # (ts, event_id), and micro-batch arrival order is not
    # deterministic for same-ts rows
    sort_cols = [ts_col] + ([id_col] if id_col in in_cols else [])

    def assign(key, pdfs, state: GroupState):
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            yield pd.DataFrame(columns=[f.name for f in out_schema.fields])
            return
        batch = pd.concat(chunks).sort_values(sort_cols, kind="mergesort")
        last_us, sess = state.get if state.exists else (None, 0)
        us = (
            batch[ts_col].astype("datetime64[us]").astype("int64").tolist()
        )
        starts, sids = [], []
        user = key[0]
        for t in us:
            if last_us is None or t - last_us > gap_us:
                sess += 1
                starts.append(True)
            else:
                starts.append(False)
            sids.append(f"{user}#{sess}")
            last_us = t
        state.update((int(last_us), int(sess)))
        out = batch[in_cols].copy()
        out["is_session_start"] = starts
        out["session_id"] = sids
        yield out

    return stream.groupBy(F.col(user_col)).applyInPandasWithState(
        assign, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )


def stream_hopping_counts(
    event_stream: DataFrame,
    window: str = "60 minutes",
    slide: str = "20 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of the batch ``hopping_counts`` query: sliding
    windows per event_type with a watermark bounding state (windows
    older than the watermark finalize and evict — the state-store
    growth cap a 24/7 ingest needs). Batch parity is pinned by test:
    an availableNow pass over a static corpus produces exactly the
    batch aggregation's rows.

    Watermarks require TIMESTAMP (not NTZ): the event time is cast to
    the session-UTC instant for watermarking and the window bounds
    cast back to NTZ, so streaming output rows compare equal to the
    NTZ batch twin."""
    ntz = "timestamp_ntz"
    return (
        event_stream.withColumn("_wts", F.col("ts").cast("timestamp"))
        .withWatermark("_wts", watermark)
        .groupBy(
            F.window("_wts", window, slide).alias("w"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").cast(ntz).alias("w_start"),
            F.col("w.end").cast(ntz).alias("w_end"),
            "event_type",
            "cnt",
        )
    )
