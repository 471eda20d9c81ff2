"""Change-data-capture application: MERGE-style upserts and SCD2
entity history.

The batch halves of what Iceberg's ``MERGE INTO`` / row-level deletes
give a KG store in production: a crawl delta (new/changed/vanished
pages → changed entities) is applied to the previous snapshot without
rewriting untouched rows' content, and attribute history is kept as
validity intervals so queries can ask "what did we believe about this
entity at time t" (the temporal twin of `store.py`'s named-graph
versioning; the reference's mtime-diff sync, syncfs/service.py, is
the file-level special case).

Scale shape: both operators are ONE anti-join + ONE union on the key
hash — no windows over the full snapshot, no driver state. The
snapshot side arrives bucketed by key (`model.write_bucketed`) so the
anti-join co-locates without a shuffle; the delta is the small side
and broadcasts.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """MERGE INTO semantics over a keyed snapshot: ``changes`` carries
    ``op ∈ {'upsert', 'delete'}``; upserted keys replace their snapshot
    rows, deleted keys vanish, untouched rows pass through. If the
    delta holds several rows for one key, every non-delete row
    survives only if the key has no delete (delete wins — the
    CDC-compaction convention); exact-duplicate upserts collapse.

    Columns: ``changes`` must carry the snapshot's columns plus
    ``op``. Returns the new snapshot with the snapshot's column order.

    NULL key components behave as one ordinary key value (all joins
    are null-safe): a NULL-key upsert replaces the snapshot's NULL-key
    rows and a NULL-key delete wins over its upserts — a plain
    equi-join would silently duplicate the row and ignore the delete.
    """
    keys = list(key_cols)
    snap_cols = snapshot.columns

    def _anti(left: DataFrame, right_keys: DataFrame) -> DataFrame:
        l, r = left.alias("_l"), right_keys.alias("_r")
        cond = None
        for k in keys:
            c = F.col(f"_l.{k}").eqNullSafe(F.col(f"_r.{k}"))
            cond = c if cond is None else cond & c
        return l.join(r, cond, "left_anti")

    touched = changes.select(*keys).distinct()
    kept = _anti(snapshot, touched)
    deleted = changes.where(F.col(op_col).eqNullSafe("delete")).select(
        *keys
    ).distinct()
    inserted = (
        # null-safe: a malformed NULL op must upsert, not silently
        # vanish (plain != would be NULL → filtered → key deleted via
        # the `touched` anti-join with no error)
        _anti(changes.where(~F.col(op_col).eqNullSafe("delete")), deleted)
        .select(*snap_cols)
        .distinct()
    )
    return kept.unionByName(inserted)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: ``dim`` holds versioned rows
    (``valid_from``, ``valid_to`` — NULL marks the current version);
    ``updates`` holds new attribute states stamped ``ts``. Each
    updated key's current row is CLOSED at the key's earliest update
    timestamp, and every update row opens a version valid until the
    key's next update (NULL for the newest) — applying a batch that
    contains several updates per key chains their intervals, the
    standard warehouse backfill behavior.

    History rows (``valid_to`` already set) are untouched. Updates
    STALER than a key's current version (``ts`` < the current row's
    ``valid_from``) are dropped: splicing them in would rewrite closed
    history, and closing the current row before it opened would mint
    an inverted interval — late-arriving dimension facts need a
    history rebuild, not an incremental apply. ``ts`` equal to the
    current ``valid_from`` degenerates that row to the empty interval
    ``[t, t)`` (the update supersedes it under the half-open
    convention). Returns the new dimension table: dim's columns, same
    order.

    Plan: one window over the UPDATES only (tiny vs the dimension) to
    chain intervals, two key-hash joins against current rows (stale
    filter + close), one union. Never sorts or rewrites closed
    history.
    """
    keys = list(key_cols)
    dim_cols = dim.columns
    attr_cols = [
        c for c in dim_cols if c not in (*keys, valid_from, valid_to)
    ]
    current = dim.where(F.col(valid_to).isNull())
    cur_from = current.select(
        *keys, F.col(valid_from).alias("_cur_from")
    )
    live = (
        updates.join(cur_from, keys, "left")
        .where(
            F.col("_cur_from").isNull()
            | (F.col(ts_col) >= F.col("_cur_from"))
        )
        .drop("_cur_from")
    )
    # tie-break equal timestamps on the attribute values themselves —
    # deterministic across runs/partitionings AND portable (an
    # engine-private hash like xxhash64 would make the chain order
    # unreproducible outside Spark; equal-ts rows are rare but real:
    # two attribute changes in one crawl tick)
    w = Window.partitionBy(*keys).orderBy(
        ts_col, *[F.col(c) for c in attr_cols]
    )
    opened = live.select(
        *keys,
        *attr_cols,
        F.col(ts_col).alias(valid_from),
        F.lead(ts_col).over(w).alias(valid_to),
    )
    first_ts = live.groupBy(*keys).agg(
        F.min(ts_col).alias("_close_at")
    )
    closed_now = (
        current.join(first_ts, keys)
        .select(
            *keys,
            *attr_cols,
            F.col(valid_from),
            F.col("_close_at").alias(valid_to),
        )
    )
    untouched_current = current.join(first_ts.select(*keys), keys, "left_anti")
    history = dim.where(F.col(valid_to).isNotNull())
    return (
        history.select(*dim_cols)
        .unionByName(untouched_current.select(*dim_cols))
        .unionByName(closed_now.select(*dim_cols))
        .unionByName(opened.select(*dim_cols))
    )
