"""PageRank over a link graph — web-curation domain/host ranking.

Production corpus curation weighs documents by the authority of their
source host (the CommonCrawl pipeline publishes exactly this: a
centrality ranking of the host graph feeding crawl priority and quality
gates). The reference has no graph surface; this is mandated by the
training-data tier, the ranking companion to ``dedup.connected_components``
(the other iterative-graph operator in the repo, whose
localCheckpoint-per-round lineage discipline this module reuses).

Standard damped PageRank with explicit dangling handling:

    rank'(v) = (1-d)/N + d * ( sum_{u->v} rank(u)/outdeg(u)
                               + dangling_mass/N )

so total mass stays exactly 1 every iteration (``sum(rank) == 1`` is a
tested invariant, not a hope) and the result matches the textbook
power-iteration twin to float64 noise.

Scale design, per iteration:

- the edge side (data-sized, |E| rows) is joined on ``src`` against the
  rank vector (node-sized). The link table is repartitioned by ``src``
  ONCE and cached, so Catalyst reuses its hash partitioning and only the
  small rank side shuffles into each join;
- contributions aggregate map-side (partial sums per dst) before the one
  rank-vector-sized shuffle;
- the dangling correction is a scalar: one tiny aggregate over the
  (checkpointed) rank vector semi-joined to the cached dangling-node
  set — collected per round because it multiplies into every row's
  expression (model-sized driver state, same contract as
  scoring/isotonic's PAV step);
- every round's rank vector is ``localCheckpoint(eager=True)``-ed and the
  previous one unpersisted: persist alone leaves the logical plan growing
  two joins per round and the analyzer OOMs building plan strings long
  before the data is large (measured on connected_components, see
  operators/dedup.py:435).

Determinism: per-dst float sums depend on partial-aggregation order, so
reruns agree to last-ulp noise only; consumers (and the driver oracle)
compare at ``round(rank, 6)`` after 10-30 iterations, far above the
~1e-13 accumulated jitter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 20,
    damping: float = 0.85,
    dedup_edges: bool = True,
) -> DataFrame:
    """Damped PageRank over a directed edge list.

    Returns ``(node, rank)`` for every node appearing as source or
    destination; ranks sum to exactly 1 (dangling mass redistributed
    uniformly each round). ``dedup_edges=True`` (default) collapses
    parallel edges first — multigraph semantics (each duplicate edge
    counts) with ``False``.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")

    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
    )
    if dedup_edges:
        e = e.distinct()

    spark = edges.sparkSession
    par = spark.sparkContext.defaultParallelism
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("__deg"))
    # one-time layout: links partitioned by the join key so only the rank
    # vector shuffles per iteration
    links = (
        e.join(deg, "u")
        .repartition(par, "u")
        .persist()
    )
    links.count()  # materialize the cached layout once
    dangling = nodes.join(
        deg.select(F.col("u").alias("node")), "node", "left_anti"
    ).localCheckpoint(eager=True)

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).localCheckpoint(
        eager=True
    )
    teleport = (1.0 - damping) / n
    # dangling is already materialized: one cheap count decides whether
    # the per-round dangling-mass aggregate (a driver action per
    # iteration) is needed at all. Graphs where every node has an
    # out-edge (common: link graphs built per-source) skip it — dm is
    # exactly 0.0 and x + 0.0 == x in IEEE doubles, so the rank
    # arithmetic is unchanged.
    has_dangling = dangling.limit(1).count() > 0
    # without the dm action, a round is one lazy plan — run two power
    # rounds per localCheckpoint to halve the job count (the plan stays
    # two joins deep over flat checkpointed scans)
    per_ckpt = 1 if has_dangling else 2

    def step(r: DataFrame) -> DataFrame:
        if has_dangling:
            dm = (
                r.join(dangling, "node", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .first()[0]
            )
            extra = F.lit(dm / n)
        else:
            extra = None
        sums = (
            links.join(r.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"),
                    (F.col("rank") / F.col("__deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        contrib = F.coalesce(F.col("s"), F.lit(0.0))
        if extra is not None:
            contrib = contrib + extra
        return nodes.join(sums, "node", "left").select(
            "node",
            (F.lit(teleport) + F.lit(damping) * contrib).alias("rank"),
        )
    try:
        done = 0
        while done < iterations:
            batch = min(per_ckpt, iterations - done)
            stepped = ranks
            for _ in range(batch):
                stepped = step(stepped)
            new_ranks = stepped.localCheckpoint(eager=True)
            ranks.unpersist()
            ranks = new_ranks
            done += batch
    finally:
        links.unpersist()
    return ranks


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over the UNDIRECTED simple graph induced
    by ``edges`` (direction, multiplicity, and self-loops are dropped) —
    the clustering/community density signal (spam-farm link blocks and
    template cliques are triangle-dense; organic link graphs are not).

    Physical plan — degree-ordered wedge join (the Cohen / Suri-Vassilvitskii
    MapReduce formulation, implemented from the algorithm statement):

    1. canonicalize + distinct: (lo, hi) pairs, one shuffle;
    2. degrees: one map-side-combinable count;
    3. ORIENT each edge from its lower-(degree, id) endpoint to the
       higher one. Every node's out-degree in the oriented graph is
       bounded by O(sqrt(m)), so the wedge self-join below emits
       O(m^1.5) candidate wedges worst-case INDEPENDENT of the max
       degree — a star node (every web graph has one) produces ZERO
       wedges at its center instead of deg^2;
    4. wedges (u->v, u->w) join the oriented edge (v->w): every triangle
       is found exactly once (its lowest-rank corner is the wedge
       center);
    5. explode each found triangle to its 3 corners and count per node
       (map-side combinable).

    Output: (node, n_triangles) for every node WITH at least one
    triangle; left-join back for zero-filled coverage. Node dtype
    follows the input column.
    """
    a, b = F.col(src), F.col(dst)
    # three consumers (degrees, orientation, closing-edge probe): cache
    und = (
        edges.where(a.isNotNull() & b.isNotNull() & (a != b))
        .select(
            F.least(a, b).alias("x"), F.greatest(a, b).alias("y")
        )
        .distinct()
        .cache()
    )
    deg = (
        und.select(F.col("x").alias("node"))
        .unionAll(und.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    dx = deg.select(F.col("node").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("node").alias("y"), F.col("d").alias("dy"))
    ranked = und.join(dx, "x").join(dy, "y")
    lower_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    # the wedge self-join consumes oriented twice: cache, or both
    # branches recompute the two degree joins
    oriented = ranked.select(
        F.when(lower_first, F.col("x")).otherwise(F.col("y")).alias("u"),
        F.when(lower_first, F.col("y")).otherwise(F.col("x")).alias("v"),
    ).cache()
    e1 = oriented.select(F.col("u"), F.col("v").alias("w1"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("w2"))
    wedges = e1.join(e2, "u").where(F.col("w1") < F.col("w2"))
    # the closing edge between w1 < w2 (by value) sits in the CANONICAL
    # set as exactly (x=w1, y=w2) — a plain two-key equi-join (an
    # orientation-insensitive OR condition here would force a
    # nested-loop join)
    tri = wedges.join(
        und.select(F.col("x").alias("w1"), F.col("y").alias("w2")),
        ["w1", "w2"],
    ).select("u", "w1", "w2")
    # ONE pass: a union of three selects re-evaluates the whole wedge
    # pipeline per branch (measured 3x the wall time); explode doesn't
    corners = tri.select(
        F.explode(F.array("u", "w1", "w2")).alias("node")
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))
