"""Interval-overlap (range) join via time-bin bucketing.

Spark's equi-join machinery can't hash on ``ts BETWEEN start AND
end`` — a naive range join degenerates to a per-key cross product
(BroadcastNestedLoopJoin when one side is small, a full cartesian
otherwise). The scale-correct shape is the classic *binning* trick
(what Databricks' range-join optimization does under the hood):

1. points get one bucket id ``floor(ts / W)``;
2. intervals explode to every bucket they overlap
   (``sequence(floor(start/W), floor((end-1µs)/W))``);
3. equi-join on ``(keys…, bucket)`` — a plain shuffled/broadcast
   hash join Catalyst can plan, AQE can skew-split, and partial
   aggregation can sit on top of;
4. the exact half-open predicate ``start ≤ ts < end`` re-filters.

Each point lands in exactly one bucket and an interval covers any
bucket at most once, so the join needs NO post-dedup. Cost is
|points| + Σ ceil(len/W) interval replicas — pick ``bin_minutes``
near the median interval length so the replication factor stays
small; a pathological month-long interval at W=30 min replicates
~1,440×, which is still linear and bounded, never quadratic.

All timestamp math is exact integer microseconds via
``timestamp_diff`` (NTZ-safe — `unix_micros` rejects TIMESTAMP_NTZ),
matching DuckDB's ``epoch_us`` bit-for-bit under the UTC session.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPOCH = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def ts_micros(col: str | F.Column) -> F.Column:
    """Exact integer µs since epoch for TIMESTAMP / TIMESTAMP_NTZ."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff("MICROSECOND", _EPOCH, c.cast("timestamp_ntz"))


def interval_overlap_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    keys: Sequence[str] = (),
    bin_minutes: int = 60,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to every interval row with the same
    ``keys`` and ``start ≤ ts < end`` (half-open, like Structured
    Streaming windows). Returns all interval columns + all point
    columns (caller aliases ahead of time to avoid collisions; the
    shared ``keys`` appear once).

    ``how='inner'`` only — outer variants belong to the caller (left
    join the result back). Empty/inverted intervals (end ≤ start)
    match nothing and are dropped before the explode, which also
    guards ``F.sequence``'s descending-sequence surprise.
    """
    if how != "inner":
        raise ValueError("interval_overlap_join supports how='inner' only")
    width = bin_minutes * 60_000_000
    internals = {"_bin", "_ts_us", "_s_us", "_e_us", "_bins"}
    clash = internals & (set(points.columns) | set(intervals.columns))
    if clash:
        raise ValueError(f"columns collide with internals: {sorted(clash)}")
    pt = points.withColumn("_ts_us", ts_micros(ts_col)).withColumn(
        "_bin", F.floor(F.col("_ts_us") / width)
    )
    iv = (
        intervals.withColumn("_s_us", ts_micros(start_col))
        .withColumn("_e_us", ts_micros(end_col))
        .where(F.col("_e_us") > F.col("_s_us"))
        .withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.col("_s_us") / width),
                    F.floor((F.col("_e_us") - 1) / width),
                )
            ),
        )
    )
    joined = iv.join(pt, [*keys, "_bin"]).where(
        (F.col("_ts_us") >= F.col("_s_us")) & (F.col("_ts_us") < F.col("_e_us"))
    )
    keep = [*keys] + [
        c for c in intervals.columns if c not in keys
    ] + [c for c in points.columns if c not in keys]
    return joined.select(*keep)
