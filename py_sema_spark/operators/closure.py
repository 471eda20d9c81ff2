"""Iterative graph operators: transitive closure & connected components.

Spark has no recursive CTE, so SPARQL property paths ``p+`` / ``p*``
(J4 — /root/reference/sema/query/sparql_templates/broader-terms.sparql:14,
skos-broader-depth.sparql:8-13) and entity canonicalization become
driver-controlled iterative join loops — the GraphFrames-style pattern
the north_star names.

Scale notes:
- each round is one shuffle (frontier ⋈ edges on the join key) plus a
  dedup; rounds = graph diameter, not graph size;
- frontiers are ``localCheckpoint``-ed so the lineage (and its
  re-execution risk) doesn't grow with iterations;
- AQE handles moderate skew; for hub nodes the edges side can be
  pre-salted (see ``model.with_subject_bucket``);
- connected components uses the *small-star/large-star*-style
  min-label propagation: converges in O(log n) rounds on natural
  graphs.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _materialize(df: DataFrame) -> DataFrame:
    """Persist + force computation — truncates effective recomputation
    in iterative loops. (``localCheckpoint(eager=True)`` trips a
    resolution bug in Spark 4.1 on aliased plans, so persist/count is
    the portable lineage-break; iteration counts here are bounded by
    graph diameter, keeping plans shallow.)"""
    df = df.persist()
    df.count()
    return df


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    with_distance: bool = True,
) -> DataFrame:
    """All (src, dst, dist) pairs reachable via 1.. hops.

    ``dist`` is the minimum hop count — on trees (the skos:broader
    case) that equals SPARQL's ``count(?mid)`` path-node count, which
    is what skos-broader-depth groups on.
    """
    base = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    e = base.transform(_materialize)
    paths = e.withColumn("dist", F.lit(1))
    frontier = paths
    for _ in range(max_iterations):
        grown = (
            frontier.alias("f")
            .join(e.alias("e"), F.col("f.dst") == F.col("e.src"))
            .select(
                F.col("f.src").alias("src"),
                F.col("e.dst").alias("dst"),
                (F.col("f.dist") + 1).alias("dist"),
            )
        )
        # keep only genuinely new pairs (anti-join beats a full dedup of
        # the accumulated set: the frontier is small after few rounds)
        new = grown.join(
            paths.select("src", "dst"), ["src", "dst"], "left_anti"
        ).dropDuplicates(["src", "dst"])
        new = new.transform(_materialize)
        if new.isEmpty():
            break
        paths = paths.unionByName(new).transform(_materialize)
        frontier = new
    if not with_distance:
        return paths.select("src", "dst")
    return paths


def reflexive_closure(closure: DataFrame, nodes: DataFrame) -> DataFrame:
    """closure(+) → closure(*): add dist-0 self-pairs for every node."""
    selfp = nodes.select(
        F.col(nodes.columns[0]).alias("src"),
        F.col(nodes.columns[0]).alias("dst"),
    ).withColumn("dist", F.lit(0))
    return closure.unionByName(selfp.distinct())


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) with component = min node id in the component.

    Min-label propagation over undirected edges; converges in
    O(log diameter) rounds with the alternating large-star step
    folded into symmetric propagation. Deterministic: labels are the
    lexicographic min, so canonical entity IRIs are stable across runs
    and partitionings (north rule: deterministic canonicalization).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .transform(_materialize)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    ).transform(_materialize)
    for _ in range(max_iterations):
        # candidate label per node = min(own, min over neighbors)
        neigh = (
            sym.alias("e")
            .join(labels.alias("l"), F.col("e.b") == F.col("l.node"))
            .select(F.col("e.a").alias("node"), F.col("l.comp").alias("comp"))
        )
        new_labels = (
            labels.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .transform(_materialize)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
        )
        labels = new_labels
        if changed.isEmpty():
            break
    return labels


def closure_from_triples(
    triples: DataFrame, predicate: str, max_iterations: int = 25
) -> DataFrame:
    """Transitive closure of one predicate's edges in a triples table.

    The predicate-literal filter is pushed to the scan (partition /
    predicate pushdown on ``p``) before any join — the whole closure
    runs on the slice.
    """
    edges = triples.where(
        (F.col("p") == predicate) & (F.col("o_kind") == "iri")
    ).select(F.col("s").alias("src"), F.col("o").alias("dst"))
    return transitive_closure(edges, max_iterations=max_iterations)
