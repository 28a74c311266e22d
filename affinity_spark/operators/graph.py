"""Graph operators: connected components over an edge DataFrame.

The reference walks adjacency state with actor messages to collect a
component (affinity ``examples/example-distributed-graph/.../GraphApi.scala:96-117``
``collectComponent`` BFS; batch analysis in ``AnalyticsSystemSpec.scala``).
Spark-first: iterative min-label propagation — each round joins labels
across edges and keeps the per-vertex min — the classic "hash-to-min"
scheme (Rastogi et al. 2012), O(log d) rounds on real graphs. Each round is
one shuffle on vertex id; results are checkpointed via localCheckpoint to
cut the lineage so plans don't grow with iterations (what kills naive
iterative Spark jobs at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(vertex, component) with component = min vertex id in the component.

    Matches the reference's component-id convention (min vertex id,
    ``AnalyticsSystemSpec.scala:50-52``). Undirected: edges are symmetrized.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    sym = sym.repartition("u").localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint(eager=True)
    )

    # Convergence probe: min-label propagation can only DECREASE labels, so
    # the labeling changed iff sum(component) strictly decreased — one
    # cheap aggregate per round instead of an old-vs-new join. decimal(38)
    # keeps the sum exact at any vertex-id scale (no silent double
    # round-off, no int64 overflow).
    # NOTE: fusing change-detection into the propagation aggregate
    # (carrying the old label as an extra union column) measured ~40%
    # SLOWER at sf0.1 — the extra long through the shuffle costs more than
    # a driver-side aggregate probe.
    def label_sum(frame: DataFrame):
        return frame.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]

    prev_sum = label_sum(labels)
    for _ in range(max_iter):
        # neighbor's current label, propagated across each edge
        prop = (
            sym.join(labels, sym["v"] == labels["vertex"], "inner")
            .select(F.col("u").alias("vertex"), F.col("component"))
        )
        new_labels = (
            labels.select("vertex", "component")
            .union(prop)
            .groupBy("vertex")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        new_sum = label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """(vertex, component) via alternating large-star/small-star rounds
    (Kiveris et al. 2014) — same output contract as
    :func:`connected_components` (component = min vertex id), but round
    count is O(log²·n) REGARDLESS OF DIAMETER, where plain min-label
    propagation needs O(diameter) rounds. Use this for citation/link/chain
    graphs; near-dup cluster graphs (tiny diameter) don't need it — the
    propagation variant does less work per round there.

    Per round, two edge rewrites, each one shuffle + aggregate:

    - large-star: per node u, every LARGER neighbor re-points to
      min(Γ(u) ∪ {u}) — halves long tails;
    - small-star: per node u (grouped by the larger endpoint of each
      edge), every smaller-or-equal neighbor and u itself re-point to the
      minimum — collapses local stars.

    Labels only decrease, so the convergence probe is the same cheap
    decimal label-sum the propagation variant uses. Edges are
    localCheckpoint'ed per round to cut lineage. ``stats['rounds']`` (when
    a dict is passed) records the rounds used — test-pinned to stay
    logarithmic on a path graph.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.first("u"), F.min("v")).alias("m")
        )
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        canon = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins = canon.groupBy("u").agg(
            F.least(F.first("u"), F.min("v")).alias("m")
        )
        re_pointed = (
            canon.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        self_edges = mins.select(F.col("u"), F.col("m").alias("v"))
        return (
            re_pointed.union(self_edges)
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def edge_probe(frame: DataFrame):
        # (count, endpoint-sum) — a changed edge set with an identical sum
        # alone is conceivable mid-run, the pair makes aliasing a
        # two-coincidence event; equivalence tests pin the output anyway
        row = frame.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("u") + F.col("v")).cast("decimal(38,0)")).alias("s"),
        ).collect()[0]
        return (row["n"], row["s"])

    prev = edge_probe(e)
    rounds = 0
    for _ in range(max_iter):
        e = small_star(large_star(e)).localCheckpoint(eager=True)
        rounds += 1
        cur = edge_probe(e)
        if cur == prev:
            break
        prev = cur
    if stats is not None:
        stats["rounds"] = rounds

    # fixpoint edges form stars (child -> component min); roots label
    # themselves, and the original isolated-by-filter self-loop vertices
    # (u == v in the input) label themselves too
    canon = e.select(
        F.greatest("u", "v").alias("vertex"), F.least("u", "v").alias("component")
    ).distinct()
    verts = (
        edges.select(F.col(src).alias("vertex"))
        .union(edges.select(F.col(dst).alias("vertex")))
        .distinct()
    )
    return (
        verts.join(canon, "vertex", "left")
        .select(
            "vertex",
            F.coalesce(F.col("component"), F.col("vertex")).alias("component"),
        )
    )


def pagerank_ppm(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    scale: int = 1_000_000,
    checkpoint_every: int = 8,
) -> DataFrame:
    """PageRank in integer parts-per-million — engine-exact by construction.

    Float PageRank diverges across engines at the ULP level (accumulation
    order), so the recurrence is defined in integer arithmetic and any
    engine that mirrors it reproduces the ranks bit-for-bit:

        share(u)  = r(u) div outdeg(u)
        in_sum(v) = Σ share(u) over edges u→v
        r'(v)     = (15 * scale) div 100 + (85 * in_sum(v)) div 100

    (damping 0.85; dangling vertices keep the base term — the standard
    sink-loss variant, stated so the oracle matches). Runs a FIXED number
    of iterations — the cross-engine contract is the recurrence, not a
    float convergence test.

    Scale shape: the static frames (degree-annotated edges, vertex list)
    are persisted for the loop's repeated use; iterations build ONE fused
    DAG (AQE reuses the static exchanges) with a lineage-cutting
    localCheckpoint only every ``checkpoint_every`` iterations — for small
    fixed iteration counts the plan executes as a single job with zero
    intermediate materializations. Measured at sf0.1: 4.8 s with
    per-iteration eager checkpoints → 0.6 s with this shape (8×), ranks
    bit-identical. The final ranks are materialized as a cached frame so
    the statics can be unpersisted immediately; the returned cache entry
    is registered with ``affinity_spark.cache`` for the caller to
    ``release_shared()`` after consuming it. Iterations shuffle
    edge-sized data only.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    deg = e.groupBy("u").agg(F.count("*").cast("long").alias("outdeg"))
    e_deg = e.join(deg, "u").persist()
    verts = (
        e.select(F.col("u").alias("vertex"))
        .union(e.select(F.col("v").alias("vertex")))
        .distinct()
        .persist()
    )
    base = (15 * scale) // 100

    ranks = verts.withColumn("rank_ppm", F.lit(scale).cast("long"))
    for i in range(iters):
        shares = (
            e_deg.join(ranks, e_deg["u"] == ranks["vertex"], "inner")
            .select(
                F.col("v"),
                F.expr("rank_ppm div outdeg").alias("share"),
            )
        )
        in_sums = shares.groupBy("v").agg(F.sum("share").alias("in_sum"))
        ranks = verts.join(in_sums, verts["vertex"] == in_sums["v"], "left").select(
            "vertex",
            (
                F.lit(base).cast("long")
                + F.expr("(85 * coalesce(in_sum, 0L)) div 100")
            ).alias("rank_ppm"),
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint(eager=True)
    # Materialize the final ranks as a CACHED DataFrame action (count), not
    # an eager localCheckpoint: the checkpoint's RDD path bypasses AQE —
    # no broadcast conversion, no exchange reuse, fixed tiny partitions —
    # and measured 6x slower end-to-end (4.1 s vs 0.65 s at sf0.1). The
    # cached result is vertex-sized; statics unpersist once it exists.
    from affinity_spark.cache import track

    ranks = track(ranks.persist())
    ranks.count()
    e_deg.unpersist()
    verts.unpersist()
    return ranks


def collect_component(
    edges: DataFrame, vertex: int, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """Vertices reachable from ``vertex`` (the reference's collectComponent)."""
    comps = connected_components(edges, src, dst, max_iter)
    target = comps.filter(F.col("vertex") == vertex).select(
        F.col("component").alias("_c")
    )
    return (
        comps.join(F.broadcast(target), comps["component"] == F.col("_c"))
        .select("vertex", "component")
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact per-vertex triangle counts via degree-ordered edge orientation
    (the MapReduce scheme of Suri & Vassilvitskii 2011): every undirected
    edge points from its lower endpoint to its higher one under the total
    order (degree, vertex id), wedges are enumerated at each edge's LOW
    vertex only, and a wedge is a triangle iff its far pair is an edge.

    Why this shape survives 100 TB: out-degree under the orientation is
    O(sqrt(m)) regardless of raw degree skew — a celebrity vertex with
    10^7 neighbors generates wedges at its (low-degree) neighbors, never
    C(10^7, 2) pairs at itself. Cost is one vertex-sized degree aggregate,
    a wedge self-join shuffled on the low vertex, and a closing equi-join
    shuffled on the far pair — all key-partitioned, nothing broadcast at
    corpus scale, no iteration. Each triangle is found exactly once (at
    its order-minimal vertex), then credited to all three corners.

    Returns (vertex, n_triangles) for vertices in >= 1 triangle.
    """
    from affinity_spark.cache import track

    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # three consumers (degree agg, orientation join, closing join) would
    # otherwise re-derive the canonical edge set — and its whole upstream
    # edge derivation — once each (the multi-branch persist rule)
    e = track(e.persist())
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = e.join(
        deg.select(F.col("v").alias("a"), F.col("deg").alias("_da")), "a"
    ).join(deg.select(F.col("v").alias("b"), F.col("deg").alias("_db")), "b")
    low_is_a = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(low_is_a, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(low_is_a, F.col("b")).otherwise(F.col("a")).alias("w"),
    )
    # consumed twice by the wedge self-join
    oriented = track(oriented.persist())
    # wedge far pair in CANONICAL id order so it joins the undirected edge
    # set directly — the closing edge's own orientation is irrelevant
    wedges = (
        oriented.select("u", F.col("w").alias("v1"))
        .join(oriented.select("u", F.col("w").alias("v2")), "u")
        .filter(F.col("v1") < F.col("v2"))
    )
    closed = wedges.join(
        e, (F.col("v1") == F.col("a")) & (F.col("v2") == F.col("b"))
    ).select("u", "v1", "v2")
    corners = (
        closed.select(F.col("u").alias("vertex"))
        .unionAll(closed.select(F.col("v1").alias("vertex")))
        .unionAll(closed.select(F.col("v2").alias("vertex")))
    )
    return corners.groupBy("vertex").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
