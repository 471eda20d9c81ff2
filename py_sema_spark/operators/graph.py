"""Graph analytics over the extracted link graph.

A webtext KG build wants link-structure signals next to content
signals: PageRank of the crawl graph ranks hub/authority pages for
crawl prioritization and quality weighting (the classic companion to
the Gopher/CCNet content filters in `operators/curation.py`).

Scale design mirrors `operators/closure.py`: each power iteration is
ONE shuffle (contribution aggregate keyed on the destination node) +
a broadcast of two scalar frames (node count, dangling mass — never a
driver-side collect), with `localCheckpoint` lineage cuts so plan
depth stays constant across iterations. Hub destinations pre-combine
map-side inside the aggregation; hub *sources* are the skew-join case
AQE splits (the rank side of the join is one row per node).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_simple(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    a: str = "_ca",
    b: str = "_cb",
    checkpoint: bool = False,
) -> DataFrame:
    """Canonical undirected simple edge list: drop self-loops, orient
    each edge (min, max), dedup. Shared by the triangle / wedge /
    k-core / common-neighbor family so a fix (e.g. null or self-loop
    handling) lands in one place. ``checkpoint`` materializes the
    dedup once when the result feeds multiple plan branches."""
    und = (
        edges.select(F.col(src_col).alias(a), F.col(dst_col).alias(b))
        .where(F.col(a) != F.col(b))
        .select(F.least(a, b).alias(a), F.greatest(a, b).alias(b))
        .distinct()
    )
    return und.localCheckpoint(eager=False) if checkpoint else und


def symmetric_adjacency(und: DataFrame, a: str = "_ca", b: str = "_cb") -> DataFrame:
    """(center, neighbor) rows in both directions of an undirected
    edge list produced by :func:`undirected_simple`."""
    return und.select(F.col(a).alias("c"), F.col(b).alias("n")).unionByName(
        und.select(F.col(b).alias("c"), F.col(a).alias("n"))
    )


def non_null_edges(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Drop edges with a NULL endpoint. NULL is not a vertex: without
    this, the PageRank family would count NULL in N and every round's
    contribution aggregate would group real rank mass under node=NULL
    where the equality join back to the node set silently drops it —
    breaking mass conservation. (shortest_paths / closure already
    filter; undirected_simple's ``a != b`` predicate drops NULLs as a
    side effect.)"""
    return edges.where(
        F.col(src_col).isNotNull() & F.col(dst_col).isNotNull()
    )


def out_degrees(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(node, out_deg) for every source node — one hash aggregate."""
    return edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )


def graph_nodes(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    return (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 3,
) -> DataFrame:
    """Power-iteration PageRank with dangling-mass redistribution.

    ``r ← (1−d)/N + d·(Σ_in r/out_deg + dangling_mass/N)`` — total
    rank mass stays 1 every round (asserted in tests with dangling
    nodes present).

    Returns (node, rank). Per round: one join rank⋈edges on the
    source key, one aggregate keyed on destination, one left join
    back to the node set; N and the dangling mass ride along as
    broadcast single-row frames. ``checkpoint_every`` bounds lineage
    exactly like the closure loop (`closure.py`).
    """
    edges = non_null_edges(edges, src_col, dst_col)
    nodes = graph_nodes(edges, src_col, dst_col).localCheckpoint()
    n_df = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("_n")))
    deg = out_degrees(edges, src_col, dst_col)
    # attach out_deg to each edge once, outside the loop
    edges_deg = (
        edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
        .join(deg.withColumnRenamed("node", "_src"), "_src")
        .localCheckpoint()
    )
    ranks = nodes.crossJoin(n_df).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    one_minus_d = 1.0 - damping
    # one cheap driver-side check up front (same budget class as the
    # closure loop's isEmpty): a dangling-free graph — the common case
    # for synthetic/link-complete corpora — skips the per-iteration
    # dangling-mass aggregate entirely, keeping each round's plan to
    # one join + one aggregate
    has_dangling = not nodes.join(deg, "node", "left_anti").isEmpty()
    for i in range(iterations):
        contribs = (
            ranks.withColumnRenamed("node", "_src")
            .join(edges_deg, "_src")
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("_c"))
        )
        redistributed = F.coalesce("_c", F.lit(0.0))
        out = nodes.join(contribs, "node", "left").crossJoin(n_df)
        if has_dangling:
            dangling = F.broadcast(
                ranks.join(deg, "node", "left_anti").agg(
                    F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
                )
            )
            out = out.crossJoin(dangling)
            redistributed = redistributed + F.col("_dm") / F.col("_n")
        ranks = out.select(
            "node",
            (
                F.lit(one_minus_d) / F.col("_n")
                + F.lit(damping) * redistributed
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint()
    return ranks


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    with_degree: bool = False,
) -> DataFrame:
    """Per-node triangle count over the undirected simple graph.

    The standard two-join scheme with **degree ordering**: edges are
    oriented from the lower-(degree, id) endpoint to the higher one,
    so every triangle is enumerated exactly once and — the scale
    property — a hub of degree d contributes wedges only through its
    ≤ d *higher-degree* neighbors, bounding wedge fan-out by the
    graph's arboricity (O(m^1.5) work total) instead of d² per hub.

    Returns (node, triangles) for every node of the graph —
    (node, degree, triangles) when ``with_degree`` is set (the degree
    frame already exists inside the pass, so exposing it is free;
    :func:`clustering_coefficient` composes on it without recomputing
    the dedup+degree subtree).
    """
    a, b = "_ta", "_tb"
    undirected = undirected_simple(edges, src_col, dst_col, a, b)
    deg = (
        undirected.select(F.col(a).alias("node"))
        .unionByName(undirected.select(F.col(b).alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    # deg feeds three plan branches (both orientation joins + the
    # output frame): cut the lineage once — |V| rows — instead of
    # recomputing the edge-dedup+degree subtree per consumer
    deg = deg.localCheckpoint(eager=False)
    # orient by (degree, node): lower endpoint first
    ranked = (
        undirected.join(deg.withColumnRenamed("node", a), a)
        .withColumnRenamed("_d", "_da")
        .join(deg.withColumnRenamed("node", b), b)
        .withColumnRenamed("_d", "_db")
    )
    fwd = ranked.select(
        F.when(
            (F.col("_da") < F.col("_db"))
            | ((F.col("_da") == F.col("_db")) & (F.col(a) < F.col(b))),
            F.struct(F.col(a).alias("lo"), F.col(b).alias("hi")),
        )
        .otherwise(F.struct(F.col(b).alias("lo"), F.col(a).alias("hi")))
        .alias("_e")
    ).select("_e.lo", "_e.hi")
    # fwd feeds three plan branches (both wedge sides + the closing
    # semi-join): cut the lineage once — |E| rows, bounded by input —
    # instead of recomputing the dedup+degree+orientation subtree 3×
    fwd = fwd.localCheckpoint()
    wedges = (
        fwd.alias("e1")
        .join(fwd.alias("e2"), F.col("e1.hi") == F.col("e2.lo"))
        .select(
            F.col("e1.lo").alias("x"),
            F.col("e1.hi").alias("y"),
            F.col("e2.hi").alias("z"),
        )
    )
    tris = wedges.join(
        fwd.select(F.col("lo").alias("x"), F.col("hi").alias("z")),
        ["x", "z"],
        "left_semi",
    )
    per_node = (
        tris.select(F.col("x").alias("node"))
        .unionByName(tris.select(F.col("y").alias("node")))
        .unionByName(tris.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    extra = [F.col("_d").alias("degree")] if with_degree else []
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            *extra,
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
        )
    )


def clustering_coefficient(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node of the undirected simple
    graph: ``c(v) = 2·T(v) / (d(v)·(d(v)−1))``, 0 where ``d(v) < 2``
    — the fraction of a node's neighbor pairs that are themselves
    connected, the classic KG-quality signal separating genuinely
    clustered entities from star-shaped scraper hubs.

    Pure narrow projection over :func:`triangle_count` with
    ``with_degree=True`` — the scale cost is exactly the degree-ordered
    triangle pass (O(m^1.5)); no additional exchange. Rounded to 6
    decimals for cross-engine float parity.

    Returns (node, degree, triangles, coeff).
    """
    t = triangle_count(edges, src_col, dst_col, with_degree=True)
    return t.select(
        "node",
        "degree",
        "triangles",
        F.when(
            F.col("degree") >= 2,
            F.round(
                F.lit(2.0)
                * F.col("triangles")
                / (F.col("degree") * (F.col("degree") - F.lit(1))),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("coeff"),
    )


def common_neighbors(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    top_k: int = 50,
    min_common: int = 2,
    max_degree: int | None = 1000,
) -> DataFrame:
    """Link prediction by common-neighbor counting — the standard KG
    edge-suggestion baseline: for every **non-adjacent** node pair
    sharing ≥ ``min_common`` neighbors, score = |N(a)∩N(b)| plus its
    Jaccard normalization; returns the ``top_k`` candidates ordered by
    (common desc, a, b) — a deterministic total order.

    Scale shape: wedge enumeration through each center is inherently
    quadratic in that center's degree, so hubs are the whole cost —
    ``max_degree`` drops super-hub centers before the self-join (the
    standard trade: "everyone links to the homepage" contributes no
    discriminative common-neighbor evidence, and a 10^6-degree hub
    would alone emit 10^12 wedges). Remaining wedges hash-aggregate
    with map-side combine on the (a, b) pair; the adjacency anti-join
    keys on the same pair; degrees join back from the *uncapped* graph.
    Scoring caveat under capping: a pair whose shared neighbors include
    a dropped super-hub gets its `common` (and hence jaccard numerator)
    from sub-cap centers only while the denominators stay uncapped —
    scores are exact iff none of the pair's shared neighbors was
    capped, and systematically understated otherwise (conservative:
    capping never inflates a score). Final top-k is a TakeOrdered (no
    global sort).
    """
    a, b = "_ca", "_cb"
    # the deduped edge set feeds four consumers (both wedge sides via
    # sym, the degree agg, the adjacency anti-join) — materialize it
    # once (lazy localCheckpoint, the dedup-token-set pattern) instead
    # of re-running the distinct per branch
    und = undirected_simple(edges, src_col, dst_col, a, b, checkpoint=True)
    sym = symmetric_adjacency(und, a, b)
    deg = sym.groupBy(F.col("n").alias("node")).agg(
        F.count(F.lit(1)).alias("_d")
    )
    centers = sym
    if max_degree is not None:
        cdeg = sym.groupBy("c").agg(F.count(F.lit(1)).alias("_cd"))
        centers = sym.join(
            cdeg.where(F.col("_cd") <= max_degree).select("c"), "c"
        )
    # both wedge sides read the capped adjacency — build it once
    centers = centers.localCheckpoint(eager=False)
    wedges = (
        centers.alias("x")
        .join(centers.alias("y"), "c")
        .where(F.col("x.n") < F.col("y.n"))
        .select(F.col("x.n").alias(a), F.col("y.n").alias(b))
    )
    cn = wedges.groupBy(a, b).agg(F.count(F.lit(1)).alias("common"))
    cand = cn.where(F.col("common") >= min_common).join(
        und, [a, b], "left_anti"
    )
    scored = (
        cand.join(
            deg.select(F.col("node").alias(a), F.col("_d").alias("_da")), a
        )
        .join(
            deg.select(F.col("node").alias(b), F.col("_d").alias("_db")), b
        )
        .select(
            F.col(a).alias("a"),
            F.col(b).alias("b"),
            "common",
            F.round(
                F.col("common")
                / (F.col("_da") + F.col("_db") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(F.desc("common"), "a", "b").limit(top_k)


def adamic_adar(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    top_k: int = 50,
    min_common: int = 2,
    max_degree: int | None = 1000,
) -> DataFrame:
    """Adamic-Adar link prediction — :func:`common_neighbors` with the
    standard rarity weighting: each shared neighbor ``c`` contributes
    ``1/ln(deg(c))`` instead of 1, so a pair sharing two obscure
    neighbors outranks one sharing two hubs.

    Returns top_k ``(a, b, common, aa)`` ordered by (aa desc, a, b).
    Per-wedge weights are rounded to 8 decimals before the pair sum
    and the sum to 6 — the float-associativity pinning every summed-
    double oracle here uses. Same plan shape and ``max_degree`` hub
    cap as ``common_neighbors`` (a wedge center has degree ≥ 2 by
    construction, so ``ln(deg)`` never hits zero).
    """
    a, b = "_ca", "_cb"
    und = undirected_simple(edges, src_col, dst_col, a, b, checkpoint=True)
    sym = symmetric_adjacency(und, a, b)
    cdeg = sym.groupBy("c").agg(F.count(F.lit(1)).alias("_cd"))
    cap = max_degree if max_degree is not None else (1 << 62)
    # no broadcast hint: cdeg is O(|V|) rows (per-node degrees, nearly
    # all under the cap on a real graph) — let AQE decide, exactly as
    # common_neighbors does for the identical join
    centers = sym.join(
        cdeg.where(F.col("_cd") <= cap), "c"
    ).localCheckpoint(eager=False)
    wedges = (
        centers.alias("x")
        .join(centers.alias("y"), "c")
        .where(F.col("x.n") < F.col("y.n"))
        .select(
            F.col("x.n").alias(a),
            F.col("y.n").alias(b),
            F.round(F.lit(1.0) / F.log(F.col("x._cd")), 8).alias("_w"),
        )
    )
    scored = wedges.groupBy(a, b).agg(
        F.count(F.lit(1)).alias("common"),
        F.round(F.sum("_w"), 6).alias("aa"),
    )
    out = scored.where(F.col("common") >= min_common).join(
        und, [a, b], "left_anti"
    )
    return out.select(
        F.col(a).alias("a"), F.col(b).alias("b"), "common", "aa"
    ).orderBy(F.desc("aa"), "a", "b").limit(top_k)


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 30,
) -> DataFrame:
    """Multi-source BFS hop distances: (node, dist) for every node
    reachable from ``sources`` (a one-column frame of start nodes),
    dist = minimum hop count (0 for the sources themselves).

    The crawl-frontier primitive (reference's link-follow harvest,
    /root/reference/sema/harvest/__init__.py executor loop, is BFS
    with depth bookkeeping) and the landmark half of graph-distance
    features for KG entity ranking.

    Scale shape: per round ONE shuffle — frontier ⋈ edges on the
    source key — then a left-anti join against the settled set to
    keep only first-time nodes (Δ-stepping not needed for unit
    weights). Frontiers and the settled set are localCheckpoint-ed
    (same O(1)-plan-depth discipline as closure.py); rounds =
    eccentricity of the source set, never graph size. Hub sources in
    the frontier⋈edges join are AQE-splittable; the settled set never
    exceeds (node, dist) width, so the anti-join's build side stays
    narrow.
    """
    from .closure import _materialize

    e = (
        edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
        .where(F.col("_s").isNotNull() & F.col("_d").isNotNull())
        .distinct()
        .transform(_materialize)
    )
    settled = (
        sources.select(F.col(sources.columns[0]).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("int"))
        .transform(_materialize)
    )
    frontier = settled
    for hop in range(1, max_hops + 1):
        grown = (
            frontier.join(e, frontier["node"] == e["_s"])
            .select(F.col("_d").alias("node"))
            .distinct()
        )
        new = (
            grown.join(settled.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop).cast("int"))
            .transform(_materialize)
        )
        if new.isEmpty():
            break
        settled = settled.unionByName(new).transform(_materialize)
        frontier = new
    return settled


def hits(
    edges: DataFrame,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hub/authority scores (Kleinberg) — the bipartite companion
    to :func:`pagerank` for webtext KG page ranking: authorities are
    pages good links point AT, hubs are pages that point at good
    authorities.

    Per iteration: auth ← Σ hub over in-edges, L1-normalize; then
    hub ← Σ (new) auth over out-edges, L1-normalize. L1 (not the
    textbook L2) keeps the math sum/divide only — exactly portable to
    the unrolled-CTE SQL oracle, same trick as pagerank's. Nodes
    without in-(out-)edges carry score 0, so mass totals stay 1.

    Scale shape per round: two shuffles (one aggregate keyed on dst,
    one on src — hub destinations pre-combine map-side) and two
    broadcast scalar frames for the normalizers; lineage cut per
    round via localCheckpoint, O(1) plan depth. Returns
    (node, hub, auth) rounded to 6.
    """
    from .closure import _materialize

    e = (
        non_null_edges(edges, src_col, dst_col)
        .select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .transform(_materialize)
    )
    nodes = graph_nodes(e).transform(_materialize)

    def _normalize(scores: DataFrame) -> DataFrame:
        s = F.broadcast(scores.agg(F.sum("s").alias("_sum")))
        return scores.crossJoin(s).select(
            "node", (F.col("s") / F.col("_sum")).alias("s")
        )

    hub = nodes.withColumn("s", F.lit(1.0))
    auth = nodes.withColumn("s", F.lit(1.0))
    for _ in range(iterations):
        raw_a = (
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("s").alias("_r"))
        )
        auth = _normalize(
            nodes.join(raw_a, "node", "left").select(
                "node", F.coalesce("_r", F.lit(0.0)).alias("s")
            )
        ).transform(_materialize)
        raw_h = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("s").alias("_r"))
        )
        hub = _normalize(
            nodes.join(raw_h, "node", "left").select(
                "node", F.coalesce("_r", F.lit(0.0)).alias("s")
            )
        ).transform(_materialize)
    return (
        hub.withColumnRenamed("s", "_h")
        .join(auth.withColumnRenamed("s", "_a"), "node")
        .select(
            "node",
            F.round("_h", 6).alias("hub"),
            F.round("_a", 6).alias("auth"),
        )
    )


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 3,
) -> DataFrame:
    """TrustRank (Gyöngyi et al. 2004): personalized PageRank whose
    teleport vector is uniform over a trusted ``seeds`` frame (one
    column of node ids) instead of uniform over all nodes — the
    standard webtext trust/spam-demotion signal: trust flows out of
    hand-vetted pages along links and decays with distance.

    ``r ← (1−d)·1[seed]/|S| + d·(Σ_in r/out_deg + dangling·1[seed]/|S|)``
    — dangling mass also teleports to the seeds, so total mass stays
    1 (asserted in tests). Non-seed pages unreachable from any seed
    score exactly 0.

    Same per-round plan as :func:`pagerank` (one join + one aggregate
    + broadcast scalars); the seed indicator is a broadcast left-semi
    hash join, never a driver-side collect — seeds can be millions of
    rows on a real cluster.
    """
    edges = non_null_edges(edges, src_col, dst_col)
    nodes = graph_nodes(edges, src_col, dst_col).localCheckpoint()
    seed_nodes = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .join(nodes, "node", "left_semi")
        .localCheckpoint()
    )
    if seed_nodes.isEmpty():
        # |S| = 0 would silently divide the teleport mass by zero and
        # return all-NULL ranks (or throw mid-job under ANSI)
        raise ValueError("trustrank: no seed appears in the graph")
    s_df = F.broadcast(seed_nodes.agg(F.count(F.lit(1)).alias("_s")))
    deg = out_degrees(edges, src_col, dst_col)
    edges_deg = (
        edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
        .join(deg.withColumnRenamed("node", "_src"), "_src")
        .localCheckpoint()
    )
    # seed indicator rides on the node frame: 1/|S| for seeds, else 0
    nodes_j = (
        nodes.join(
            F.broadcast(seed_nodes.withColumn("_is_seed", F.lit(1.0))),
            "node",
            "left",
        )
        .crossJoin(s_df)
        .select(
            "node",
            (F.coalesce("_is_seed", F.lit(0.0)) / F.col("_s")).alias("_jump"),
        )
        .localCheckpoint()
    )
    ranks = nodes_j.select("node", F.col("_jump").alias("rank"))
    one_minus_d = 1.0 - damping
    has_dangling = not nodes.join(deg, "node", "left_anti").isEmpty()
    for i in range(iterations):
        contribs = (
            ranks.withColumnRenamed("node", "_src")
            .join(edges_deg, "_src")
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("_c"))
        )
        out = nodes_j.join(contribs, "node", "left")
        inflow = F.coalesce("_c", F.lit(0.0))
        if has_dangling:
            dangling = F.broadcast(
                ranks.join(deg, "node", "left_anti").agg(
                    F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
                )
            )
            out = out.crossJoin(dangling)
            inflow = inflow + F.col("_dm") * F.col("_jump")
        ranks = out.select(
            "node",
            (
                F.lit(one_minus_d) * F.col("_jump")
                + F.lit(damping) * inflow
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint()
    return ranks


def neighbor_agg(
    edges: DataFrame,
    features: DataFrame,
    id_col: str = "node",
    feature_cols: Sequence[str] = ("f",),
    hops: int = 1,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """GNN-style neighborhood feature aggregation: for every node,
    the mean of its out-neighbors' features; ``hops=2`` feeds hop-1's
    aggregates back through the edge list (mean-of-means — GraphSAGE's
    mean aggregator without the learned weights). The feature-
    propagation primitive for KG node representations: entity quality
    / length / trust signals smoothed over the link structure.

    Per hop ONE shuffle: edges ⋈ features on the neighbor key (hub
    neighbors broadcast well when the feature frame is small; AQE
    skew-splits otherwise), then a src-keyed average with map-side
    partial aggregation. Nodes with no out-neighbors drop out of the
    result (no NULL rows to carry), matching the plain-SQL twin.

    Returns ``(node, <f>_nbr_avg …)`` with doubles rounded to 6 —
    the usual cross-engine float pinning.
    """
    from .closure import _materialize

    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    ).distinct()
    cur = features.select(
        F.col(id_col).alias("_nbr"),
        *[F.col(c).cast("double").alias(f"_v_{c}") for c in feature_cols],
    )
    for _ in range(hops):
        cur = (
            e.join(cur, e["_dst"] == cur["_nbr"])
            .groupBy(F.col("_src").alias("_nbr"))
            .agg(
                *[
                    F.avg(f"_v_{c}").alias(f"_v_{c}")
                    for c in feature_cols
                ]
            )
        ).transform(_materialize)
    return cur.select(
        F.col("_nbr").alias(id_col),
        *[
            F.round(F.col(f"_v_{c}"), 6).alias(f"{c}_nbr_avg")
            for c in feature_cols
        ],
    )


def k_core(
    edges: DataFrame,
    k: int = 3,
    rounds: int | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """k-core peeling: repeatedly delete nodes with undirected degree
    < k; survivors form the k-core — the standard dense-subgraph
    filter (seed selection for entity canonicalization, spam-farm
    detection in webtext link graphs).

    By default peels TO CONVERGENCE (sweep until no node drops) —
    without the fixpoint check, a peeling cascade deeper than any
    fixed round count leaves non-core survivors (a k=2 path graph
    needs ~len/2 sweeps). Each sweep is the parallel/"bulk" variant,
    which converges in far fewer sweeps than sequential textbook
    peeling. Pass an explicit ``rounds`` for a FIXED sweep count —
    the variant the unrolled-CTE SQL oracle mirrors bit-identically
    (the bench fixture converges within its unroll depth, so the two
    modes coincide there). Tests pin a case where round r+1 differs
    from round r and a deep-cascade case fixed rounds would miss.

    Per round: two semi-joins restrict the symmetric edge list to
    live endpoints, then one count aggregate keyed on the center —
    all hash joins on node ids; the live set stays one narrow column
    and is localCheckpoint-ed per round. Convergence mode adds one
    driver-side count per sweep (same budget class as the closure
    loop's isEmpty; sweep count is bounded by the cascade depth).

    Returns the surviving ``(node)`` frame.
    """
    from .closure import _materialize

    und = undirected_simple(edges, src_col, dst_col, "a", "b")
    sym = symmetric_adjacency(und, "a", "b").transform(_materialize)
    alive = sym.select(F.col("c").alias("node")).distinct().transform(
        _materialize
    )
    prev_n = alive.count() if rounds is None else None
    sweep = 0
    while True:
        live_edges = sym.join(
            alive.withColumnRenamed("node", "c"), "c", "left_semi"
        ).join(alive.withColumnRenamed("node", "n"), "n", "left_semi")
        alive = (
            live_edges.groupBy(F.col("c").alias("node"))
            .agg(F.count(F.lit(1)).alias("_d"))
            .where(F.col("_d") >= k)
            .select("node")
            .transform(_materialize)
        )
        sweep += 1
        if rounds is not None:
            if sweep >= rounds:
                break
        else:
            n = alive.count()
            if n == prev_n or n == 0:
                break
            prev_n = n
    return alive


def weighted_pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank over WEIGHTED edges: a page splits its rank over
    out-links proportionally to edge weight (anchor prominence, link
    position, dup-count of the link across mirrors) instead of
    uniformly — ``r ← (1−d)/N + d·Σ_in r·w/Σ_out(w)``. Parallel
    edges pre-sum their weights, zero/negative weights drop, and a
    dangling-free graph skips the dangling aggregate exactly like
    :func:`pagerank` (dangling mass redistributes uniformly
    otherwise).

    Same per-round plan as the unweighted form: the normalized weight
    attaches to each edge ONCE before the loop (one aggregate + one
    join), then each round is one join + one dst-keyed aggregate.
    """
    e = (
        non_null_edges(edges, src_col, dst_col)
        .select(
            F.col(src_col).alias("_src"),
            F.col(dst_col).alias("_dst"),
            F.col(weight_col).cast("double").alias("_w"),
        )
        .where(F.col("_w") > 0)
        .groupBy("_src", "_dst")
        .agg(F.sum("_w").alias("_w"))
    )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_df = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("_n")))
    wsum = e.groupBy("_src").agg(F.sum("_w").alias("_wsum"))
    edges_norm = (
        e.join(wsum, "_src")
        .select("_src", "_dst", (F.col("_w") / F.col("_wsum")).alias("_frac"))
        .localCheckpoint()
    )
    ranks = nodes.crossJoin(n_df).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    one_minus_d = 1.0 - damping
    has_dangling = not nodes.join(
        wsum.withColumnRenamed("_src", "node"), "node", "left_anti"
    ).isEmpty()
    for i in range(iterations):
        contribs = (
            ranks.withColumnRenamed("node", "_src")
            .join(edges_norm, "_src")
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("_frac")).alias("_c"))
        )
        redistributed = F.coalesce("_c", F.lit(0.0))
        out = nodes.join(contribs, "node", "left").crossJoin(n_df)
        if has_dangling:
            dangling = F.broadcast(
                ranks.join(
                    wsum.withColumnRenamed("_src", "node"), "node", "left_anti"
                ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
            )
            out = out.crossJoin(dangling)
            redistributed = redistributed + F.col("_dm") / F.col("_n")
        ranks = out.select(
            "node",
            (
                F.lit(one_minus_d) / F.col("_n")
                + F.lit(damping) * redistributed
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint()
    return ranks


def label_propagation(
    edges: DataFrame,
    iterations: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 2,
) -> DataFrame:
    """Synchronous label-propagation community detection (LPA,
    Raghavan et al. 2007) over the UNDIRECTED link graph: every node
    starts in its own community, then each sweep adopts the label most
    frequent among its neighbours, ties broken by the smallest label —
    the deterministic synchronous variant (asynchronous/random-order
    LPA is irreproducible, which is useless under a retried-task
    execution model). GraphFrames ships the same synchronous form.

    Returns ``(node, label)`` after ``iterations`` sweeps; nodes with
    no neighbours keep their own label.

    Scale shape (mirrors :func:`weighted_pagerank`): the symmetrized
    edge list materializes once; each sweep is one join (labels onto
    edge sources — the per-node label frame is the small side AQE can
    broadcast) + one (dst, label) count aggregate with map-side
    partial combine + one per-dst argmax window. Hub destinations are
    exactly the aggregate's skew case: partial aggregation collapses
    each (hub, label) group map-side before the exchange.
    `localCheckpoint` lineage cuts keep plan depth constant.
    """
    from pyspark.sql.window import Window

    raw = non_null_edges(edges, src_col, dst_col).select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    )
    d = raw.where(F.col("_s") != F.col("_d"))
    und = (
        d.unionByName(d.select(F.col("_d").alias("_s"), F.col("_s").alias("_d")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # node universe from the RAW edges (pre self-loop drop): published
    # LPA assigns every vertex a community, so a node whose only
    # incident edges are self-loops keeps its own label rather than
    # vanishing from the assignment
    nodes = (
        raw.select(F.col("_s").alias("node"))
        .unionByName(raw.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("node").orderBy(F.desc("_c"), F.asc("label"))
    for i in range(iterations):
        counts = (
            und.join(labels.withColumnRenamed("node", "_s"), "_s")
            .groupBy(F.col("_d").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        new = (
            counts.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", F.col("label").alias("_nl"))
        )
        labels = (
            labels.join(new, "node", "left")
            .select("node", F.coalesce("_nl", F.col("label")).alias("label"))
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            labels = labels.localCheckpoint(eager=False)
    return labels
