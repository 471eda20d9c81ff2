"""Deterministic cardinality sketches.

``kmv_distinct`` is a K-Minimum-Values estimator (Bar-Yossef et al.
2002): hash every value to a uniform integer, keep the k smallest
per group, and estimate ``|distinct| ≈ (k−1) / u_k`` where ``u_k`` is
the k-th smallest hash normalized to (0,1). Unlike
``approx_count_distinct`` (HLL++, whose register layout is
engine-private), every step here is portable column algebra over
md5 — so the DuckDB oracle reproduces the estimate *bit-exactly*,
and reruns/retries can never flicker the estimate.

Scale shape: the value explode pre-distincts per (group, hash) with
map-side combine; "k smallest per group" is a rank filter that
compiles to ``WindowGroupLimit`` (each map task forwards at most k
hashes per group), so a group with 10¹⁰ distinct values ships
k·partitions rows, not 10¹⁰. Memory per group is O(k).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hash domain: first 13 hex digits of md5 → [0, 2^52), exact in a
#: double on both engines
HASH_BITS = 52
HASH_DOMAIN = float(2**HASH_BITS)


def kmv_hash(value: Column) -> Column:
    """Uniform deterministic hash of a value into [0, 2^52) as long."""
    return F.conv(F.substring(F.md5(value), 1, 13), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    k: int = 256,
    group_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Distinct-count estimate per group (or globally).

    Returns ``(*group_cols, est_distinct)``; groups with fewer than
    ``k`` distinct hashes report the exact count (the estimator's
    standard small-range behavior). Relative error ≈ 1/√(k−2)
    (~6% at k=256), asserted in tests.
    """
    if k < 2:
        raise ValueError("k must be ≥ 2")
    groups = list(group_cols or [])
    hashed = (
        # NULLs don't count as a distinct value (SQL count-distinct
        # semantics) — and md5(NULL) → NULL would sort NULLS FIRST into
        # the top-k window, stealing a slot and biasing the estimate
        df.where(F.col(value_col).isNotNull())
        .select(*groups, kmv_hash(F.col(value_col)).alias("_h"))
        .distinct()
    )
    if groups:
        w = Window.partitionBy(*groups).orderBy("_h")
    else:
        w = Window.partitionBy(F.lit(1)).orderBy("_h")
    topk = hashed.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    )
    agg = topk.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("_m"), F.max("_h").alias("_hk")
    )
    est = F.when(
        F.col("_m") < k, F.col("_m").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_DOMAIN) / F.col("_hk")
    )
    return agg.select(*groups, est.alias("est_distinct"))


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list | None = None,
    quantiles: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group exact quantiles (linear interpolation — the
    definition Spark's ``percentile`` and DuckDB's ``quantile_cont``
    share, so results are cross-engine comparable).

    Returns one row per group: ``(group…, n, p50, p90, …)``.

    Scale note: exact quantiles sort every group's values — Spark's
    ``percentile`` aggregates per-group value buffers, fine for the
    bounded-group-count profile this targets (per-language corpus
    stats: thousands of groups × millions of values). For quantiles
    OVER high-cardinality groups or as a single global pass over 100
    TB, swap in ``percentile_approx`` (t-digest, mergeable map-side)
    — same call shape, bounded memory, no longer bit-portable; the
    exact form stays as its correctness oracle at test scale, the
    same twin pattern as :func:`kmv_distinct` vs exact count-distinct.
    """
    groups = list(group_cols or [])
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.percentile(F.col(value_col), F.lit(q)).alias(
            f"p{str(q)[2:].ljust(2, '0')}"
        )
        for q in quantiles
    ]
    return df.groupBy(*groups).agg(*aggs)


def misra_gries_candidates(
    df: DataFrame, value_col: str, k: int = 100
) -> DataFrame:
    """Per-partition Misra-Gries summaries → one-column candidate
    frame (``item`` string). Guarantee (pigeonhole over partitions):
    every item with GLOBAL frequency > n/k survives in at least one
    partition's k-counter summary, so the union is a superset of the
    true heavy hitters — false positives possible, false negatives
    impossible. O(k) memory per partition, one pass, no shuffle.

    Batched decrement: after merging a batch's value_counts into the
    counters, subtracting the (k+1)-th largest count from all and
    dropping ≤0 is exactly that many decrement-all rounds at once.
    """
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            # values arrive already Spark-cast to string (below), so
            # candidates use the SAME representation the phase-2
            # semi-join casts rows to — pandas astype(str) renders
            # booleans/floats differently ("True" vs "true") and would
            # produce false negatives
            vc = pdf[value_col].value_counts()
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    i: c - cut for i, c in counters.items() if c > cut
                }
        yield pd.DataFrame({"item": list(counters.keys())})

    return df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("string").alias(value_col)
    ).mapInPandas(
        summarize, schema="item string"
    ).distinct()


def heavy_hitters(df: DataFrame, value_col: str, k: int = 100) -> DataFrame:
    """EXACT φ-heavy hitters: all items with frequency > n/k, found
    without a full-table groupBy.

    Two passes: (1) :func:`misra_gries_candidates` — no shuffle, O(k)
    state per partition, emits ≤ k·partitions candidates; (2) a
    broadcast semi-join keeps only candidate rows, then an exact count
    of that tiny slice and the ``cnt·k > n`` gate (n rides along as a
    broadcast scalar frame, never a driver collect). At 100 TB the
    full groupBy shuffles every distinct token; this shuffles only
    rows whose value is already a plausible hitter — the shuffle
    volume is bounded by n(heavy) + false positives, and the result
    is still exact (phase 2 counts, phase 1 only prunes).

    Returns ``(item, cnt)`` with the input column's type preserved.
    """
    if k < 2:
        raise ValueError("k must be ≥ 2")
    cand = misra_gries_candidates(df, value_col, k)
    vals = df.select(F.col(value_col).alias("item"))
    n_df = F.broadcast(vals.agg(F.count(F.lit(1)).alias("_n")))
    kept = vals.join(
        F.broadcast(cand.withColumnRenamed("item", "_ci")),
        F.col("item").cast("string") == F.col("_ci"),
        "left_semi",
    )
    counts = kept.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.crossJoin(n_df)
        .where(F.col("cnt") * k > F.col("_n"))
        .select("item", "cnt")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int = 20,
    group_cols: Optional[Sequence[str]] = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES): each row gets key ``ln(u)/w`` with ``u`` uniform from the
    portable md5 hash of its id, and the k largest keys per group are
    the sample — inclusion probability proportional to weight, no
    driver-side pass, no rejection loop.

    The md5-derived ``u`` makes the draw *deterministic and
    engine-independent* (same property as :func:`kmv_distinct`):
    reruns, repartitions, and the DuckDB oracle all pick the identical
    sample. Selection is one rank window per group —
    WindowGroupLimit pushes the top-k down, so per-group shipping is
    bounded by k, the exact shape of ``topk_per_group``. Rows with
    non-positive weight are excluded (they have probability 0).

    The rank is taken over the key **rounded to 6 decimals** with the
    id as tiebreak: ``log`` is not required by IEEE 754 to be
    correctly rounded, so two near-equal keys computed from different
    (u, w) pairs could otherwise straddle 1 ulp differently per
    engine; rounding first makes the ordering engine-portable.

    Returns (*group_cols, id, weight, key, rank), key rounded to 6.
    """
    groups = list(group_cols or [])
    u = (kmv_hash(F.col(id_col).cast("string")) + 1).cast(
        "double"
    ) / F.lit(HASH_DOMAIN)
    part = groups if groups else [F.lit(1)]
    w = Window.partitionBy(*part).orderBy(
        F.desc("_key"), F.asc(id_col)
    )
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_key", F.round(F.log(u) / F.col(weight_col), 6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            *groups,
            id_col,
            # native type preserved — fractional weights must not
            # truncate in the report even though only the key uses them
            F.col(weight_col).alias("weight"),
            F.col("_key").alias("key"),
            "rank",
        )
    )
