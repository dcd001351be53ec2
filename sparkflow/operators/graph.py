"""Graph analytics on relational substrates (iterative-algorithm
family, alongside llm_dedup_clusters' connected components).

The graph is derived from the event stream: within each hour, an edge
connects the user of each event to the user of the next event (by
event_id) — a co-activity graph. PageRank then runs a fixed number of
synchronous iterations.

Scale design: edge construction partitions by hour (never a global
order); each PageRank iteration is one join (ranks ⋈ edges on src) +
one aggregation (sum by dst) — the canonical MapReduce PageRank, all
shuffles keyed, no driver-side state beyond the loop counter. Ranks are
integer fixed-point (1e6 scale) so the per-iteration sums are
order-independent and the final values bit-identical to the unrolled
SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_ITER = 3
# damping 0.85 in integer arithmetic: r' = 0.15e6 + (85 * Σ contrib) / 100
_BASE_E6 = 150_000

_HOUR = "(unix_micros(ts) div 3600000000)"
_SQL_HOUR = "(epoch_us(ts) // 3600000000)"


def _oracle() -> str:
    it = """
    r{n} AS (
      SELECT n.u,
             CAST({base} + (85 * COALESCE(s.c, 0)) // 100 AS BIGINT) AS r
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS u, SUM(r.r // d.deg) AS c
        FROM edges e
        JOIN r{p} r ON r.u = e.src
        JOIN deg d ON d.u = e.src
        GROUP BY e.dst
      ) s ON s.u = n.u
    )"""
    iters = ",".join(
        it.format(n=i, p=i - 1, base=_BASE_E6) for i in range(1, _ITER + 1)
    )
    return f"""
    WITH seq AS (
      SELECT {_SQL_HOUR} AS h, event_id, user_id,
             LEAD(user_id) OVER (PARTITION BY {_SQL_HOUR}
                                 ORDER BY event_id) AS next_user
      FROM events
    ),
    edges AS (
      SELECT DISTINCT user_id AS src, next_user AS dst
      FROM seq WHERE next_user IS NOT NULL AND next_user <> user_id
    ),
    nodes AS (
      SELECT DISTINCT u FROM (SELECT src AS u FROM edges
                              UNION SELECT dst FROM edges)
    ),
    deg AS (SELECT src AS u, COUNT(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT u, CAST(1000000 AS BIGINT) AS r FROM nodes),
    {iters}
    SELECT u AS user_id, r AS rank_e6 FROM r{_ITER}
    """


@register("graph_pagerank", oracle=_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 synchronous iterations, simplified: no
    dangling-mass redistribution) over the hourly co-activity graph.
    Demonstrates the iterative-join algorithm family beyond connected
    components: the loop lives in Python, every iteration is declared
    lazily, and Catalyst sees one straight-line plan of 3 join+agg
    rounds (at higher iteration counts, localCheckpoint per round —
    as llm_dedup_clusters does — keeps lineage bounded).

    Integer fixed-point throughout: contrib = r div deg, r' = 150000 +
    (85·Σcontrib) div 100 — order-independent sums, EXACT oracle."""
    ev = table(spark, sf_dir, "events")
    h = F.expr(_HOUR).alias("h")
    w = Window.partitionBy("h").orderBy("event_id")
    seq = ev.select(h, "event_id", "user_id").withColumn(
        "next_user", F.lead("user_id").over(w)
    )
    edges = (
        seq.filter(F.col("next_user").isNotNull() & (F.col("next_user") != F.col("user_id")))
        .select(F.col("user_id").alias("src"), F.col("next_user").alias("dst"))
        .distinct()
    )
    # r17 (guide §3.3): explode both endpoints out of ONE pass over
    # edges instead of union-ing two selects of it — the window+distinct
    # edge subtree appears once in the static plan, not twice.
    nodes = (
        edges.select(F.explode(F.array("src", "dst")).alias("u"))
        .distinct()
    )
    deg = edges.groupBy(F.col("src").alias("u")).agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.withColumn("r", F.lit(1_000_000).cast("bigint"))
    for _ in range(_ITER):
        contrib = (
            edges.join(ranks.withColumnRenamed("u", "src"), "src")
            .join(deg.withColumnRenamed("u", "src"), "src")
            .select("dst", F.expr("r div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "u"), "u", "left")
            .select(
                "u",
                (
                    F.lit(_BASE_E6)
                    + F.expr("(85 * coalesce(c, 0)) div 100")
                ).cast("bigint").alias("r"),
            )
        )
    return ranks.select(F.col("u").alias("user_id"), F.col("r").alias("rank_e6"))


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             LEAD(user_id) OVER (PARTITION BY {_SQL_HOUR}
                                 ORDER BY event_id) AS next_user
      FROM events
    ),
    eu AS (
      SELECT DISTINCT LEAST(user_id, next_user) AS a,
                      GREATEST(user_id, next_user) AS b
      FROM seq WHERE next_user IS NOT NULL AND next_user <> user_id
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM eu e1
      JOIN eu e2 ON e2.a = e1.b
      JOIN eu e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    members AS (
      SELECT x AS u FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    )
    SELECT u AS user_id, COUNT(*) AS n_triangles FROM members GROUP BY u
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counting (clustering-coefficient numerator) on
    the hourly co-activity graph, via DEGREE-ORDERED edge orientation:
    orient every undirected edge from its (degree, id)-smaller endpoint,
    enumerate wedges only at each triangle's smallest vertex, and close
    them with one more join. Every triangle is found exactly once, so
    the result set equals the oracle's naive id-ordered enumeration —
    but the wedge count is bounded by Σ out-deg² with out-degree ≤
    O(√m), the property that makes this the standard 100 TB triangle
    algorithm (a skewed hub node never fans out its full degree²).

    All joins are equi-joins on node ids (hash-partitionable); the
    explode of triangle members is 3× the triangle count; no driver
    state."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("h").orderBy("event_id")
    seq = ev.select(F.expr(_HOUR).alias("h"), "event_id", "user_id").withColumn(
        "next_user", F.lead("user_id").over(w)
    )
    eu = (
        seq.filter(F.col("next_user").isNotNull() & (F.col("next_user") != F.col("user_id")))
        .select(
            F.least("user_id", "next_user").alias("a"),
            F.greatest("user_id", "next_user").alias("b"),
        )
        .distinct()
    )
    # r17 (guide §3.3 — wide unions duplicate the input subtree in the
    # static plan): explode both endpoints out of ONE pass over eu
    # instead of union-ing two selects of it. Same multiset of u rows,
    # half the eu subtrees in the plan.
    deg = (
        eu.select(F.explode(F.array("a", "b")).alias("u"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("u").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("u").alias("b"), F.col("deg").alias("deg_b"))
    # r16 (guide §2.3 — carry metadata, don't re-join it): the oriented
    # edge keeps its head's degree, so the wedge stage orders (v, w) by
    # the carried deg columns instead of re-joining the degree table
    # twice onto the Σ out-deg² wedge rows. Same deg values from the
    # same deg frame → the same ordering predicate → identical wedges.
    oriented = (
        eu.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.struct(
                    F.col("a").alias("src"),
                    F.col("b").alias("dst"),
                    F.col("deg_b").alias("deg_dst"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("b").alias("src"),
                    F.col("a").alias("dst"),
                    F.col("deg_a").alias("deg_dst"),
                )
            )
            .alias("e")
        )
        .select("e.src", "e.dst", "e.deg_dst")
    )
    e1 = oriented.toDF("u", "v", "deg_v")
    e2 = oriented.toDF("u", "w", "deg_w")
    wedges = (
        e1.join(e2, "u")
        .filter(
            (F.col("deg_v") < F.col("deg_w"))
            | ((F.col("deg_v") == F.col("deg_w")) & (F.col("v") < F.col("w")))
        )
        .select("u", "v", "w")
    )
    closing = oriented.select("src", "dst").toDF("v", "w")
    tri = wedges.join(closing, ["v", "w"])
    # r17: one explode instead of a 3-way union — the tri subtree (the
    # whole wedge pipeline) appears ONCE in the static plan instead of
    # 3×. Same multiset of member rows (explode(array(u,v,w)) emits
    # exactly the three fields per triangle), so counts are identical.
    members = tri.select(F.explode(F.array("u", "v", "w")).alias("m"))
    return members.groupBy(F.col("m").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


_LPA_ITER = 2


def _lpa_oracle() -> str:
    it = """
    n{n} AS (
      SELECT b.dst AS u, l.lbl, COUNT(*) AS c
      FROM bidir b JOIN l{p} l ON l.u = b.src
      GROUP BY b.dst, l.lbl
    ),
    l{n} AS (
      SELECT u, lbl FROM (
        SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u
                                          ORDER BY c DESC, lbl) AS rn
        FROM n{n}
      ) WHERE rn = 1
    )"""
    iters = ",".join(it.format(n=i, p=i - 1) for i in range(1, _LPA_ITER + 1))
    return f"""
    WITH seq AS (
      SELECT user_id,
             LEAD(user_id) OVER (PARTITION BY {_SQL_HOUR}, event_type
                                 ORDER BY event_id) AS next_user
      FROM events
    ),
    eu AS (
      SELECT DISTINCT LEAST(user_id, next_user) AS a,
                      GREATEST(user_id, next_user) AS b
      FROM seq WHERE next_user IS NOT NULL AND next_user <> user_id
    ),
    bidir AS (
      SELECT a AS src, b AS dst FROM eu
      UNION ALL
      SELECT b AS src, a AS dst FROM eu
    ),
    nodes AS (SELECT DISTINCT dst AS u FROM bidir),
    l0 AS (SELECT u, u AS lbl FROM nodes),
    {iters}
    SELECT CAST(u AS BIGINT) AS user_id, CAST(lbl AS BIGINT) AS community
    FROM l{_LPA_ITER}
    """


@register("graph_label_propagation", oracle=_lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label propagation (GraphX LPA shape) — community detection on the
    per-(hour, event_type) co-activity graph (sparser than the pagerank
    graph, so distinct communities survive the propagation): every node starts labeled by itself; each
    synchronous round it adopts the MOST FREQUENT label among its
    neighbors (ties → smallest label, which also makes a fixed
    iteration count fully deterministic despite LPA's famous
    oscillation). Two rounds here; the output is every node's final label (on this
    uniform synthetic graph the labels largely collapse — expected LPA
    behavior on an unstructured graph; the machinery, not the modularity,
    is what transfers).

    Scale shape: one round = one join (labels ⋈ bidirected edges on
    src) + one (node, label) count + one per-node arg-max window —
    every shuffle keyed by node id, no driver state. The per-node
    window partitions by u (never global). Same iterative-join family
    as graph_pagerank; unrolled-CTE oracle, integer-only values."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("h", "event_type").orderBy("event_id")
    seq = ev.select(
        F.expr(_HOUR).alias("h"), "event_type", "event_id", "user_id"
    ).withColumn("next_user", F.lead("user_id").over(w))
    eu = (
        seq.filter(
            F.col("next_user").isNotNull() & (F.col("next_user") != F.col("user_id"))
        )
        .select(
            F.least("user_id", "next_user").alias("a"),
            F.greatest("user_id", "next_user").alias("b"),
        )
        .distinct()
    )
    # r17 (guide §3.3): emit both directions of each undirected edge
    # with one explode instead of a 2-way union — the eu subtree
    # (window + distinct) appears once in the static plan, not twice.
    bidir = eu.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    nodes = bidir.select(F.col("dst").alias("u")).distinct()
    labels = nodes.withColumn("lbl", F.col("u"))
    per_node = Window.partitionBy("u").orderBy(F.col("c").desc(), F.col("lbl"))
    for _ in range(_LPA_ITER):
        counts = (
            bidir.join(labels.withColumnRenamed("u", "src"), "src")
            .groupBy(F.col("dst").alias("u"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            counts.withColumn("rn", F.row_number().over(per_node))
            .filter(F.col("rn") == 1)
            .select("u", "lbl")
        )
    return labels.select(
        F.col("u").cast("bigint").alias("user_id"),
        F.col("lbl").cast("bigint").alias("community"),
    )


_BFS_ROUNDS = 4
_BFS_SEEDS = 3


def _bfs_oracle() -> str:
    # Unrolled Bellman-Ford-style relaxation: d_k(v) = min(d_{k-1}(v),
    # min over edges (u,v) of d_{k-1}(u)+1). For unit weights this is
    # exactly BFS level-by-level, so it equals the frontier-pruned Spark
    # plan's fixpoint after the same number of rounds.
    it = """
    d{n} AS (
      SELECT u, MIN(dist) AS dist FROM (
        SELECT u, dist FROM d{p}
        UNION ALL
        SELECT b.dst AS u, d.dist + 1 AS dist
        FROM bidir b JOIN d{p} d ON d.u = b.src
      ) GROUP BY u
    )"""
    iters = ",".join(it.format(n=i, p=i - 1) for i in range(1, _BFS_ROUNDS + 1))
    return f"""
    WITH seq AS (
      SELECT user_id,
             LEAD(user_id) OVER (PARTITION BY {_SQL_HOUR}, event_type
                                 ORDER BY event_id) AS next_user
      FROM events
    ),
    eu AS (
      SELECT DISTINCT LEAST(user_id, next_user) AS a,
                      GREATEST(user_id, next_user) AS b
      FROM seq WHERE next_user IS NOT NULL AND next_user <> user_id
    ),
    bidir AS (
      SELECT a AS src, b AS dst FROM eu
      UNION ALL
      SELECT b AS src, a AS dst FROM eu
    ),
    nodes AS (SELECT DISTINCT dst AS u FROM bidir),
    d0 AS (
      SELECT u, CAST(0 AS INTEGER) AS dist
      FROM (SELECT u FROM nodes ORDER BY u LIMIT {_BFS_SEEDS})
    ),
    {iters}
    SELECT CAST(u AS BIGINT) AS user_id, CAST(dist AS INTEGER) AS dist
    FROM d{_BFS_ROUNDS}
    """


@register("graph_shortest_paths", oracle=_bfs_oracle())
def graph_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS shortest paths (unit weights, K synchronous
    rounds) from the 3 (_BFS_SEEDS) smallest node ids over the undirected
    per-(hour, event_type) co-activity graph — the third member of the
    iterative-join family (pagerank = value diffusion, LPA = mode
    adoption, BFS = min-plus relaxation). Returns every node reached
    within K=4 (_BFS_ROUNDS) hops with its hop distance.

    Scale shape — FRONTIER-PRUNED, not full relaxation: each round
    joins only the nodes newly reached last round against the edge
    list (one keyed shuffle), then anti-joins the settled set so a
    node is never re-expanded (BFS invariant: first touch = shortest
    distance under unit weights, so frontier pruning computes the
    identical fixpoint as the oracle's full min-relaxation). Work per
    round is O(frontier boundary), not O(V+E) — the property that
    makes level-synchronous BFS viable on billion-edge graphs, where
    full relaxation re-shuffles the whole distance table every round.
    The settled set grows monotonically; at higher K, localCheckpoint
    per round bounds lineage exactly as llm_dedup_clusters does.
    Driver state: loop counter only."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("h", "event_type").orderBy("event_id")
    seq = ev.select(
        F.expr(_HOUR).alias("h"), "event_type", "event_id", "user_id"
    ).withColumn("next_user", F.lead("user_id").over(w))
    eu = (
        seq.filter(
            F.col("next_user").isNotNull() & (F.col("next_user") != F.col("user_id"))
        )
        .select(
            F.least("user_id", "next_user").alias("a"),
            F.greatest("user_id", "next_user").alias("b"),
        )
        .distinct()
    )
    # r17 (guide §3.3): emit both directions of each undirected edge
    # with one explode instead of a 2-way union — the eu subtree
    # (window + distinct) appears once in the static plan, not twice.
    bidir = eu.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # Round k's plan embeds dist_{k-1} twice (frontier expansion + the
    # settled anti-join), so without truncation the DAG doubles per
    # round — localCheckpoint per round keeps it linear, exactly the
    # llm_dedup_clusters pattern. The edge list is checkpointed once so
    # the K expansions re-read a materialized table, not the window
    # pipeline.
    bidir = bidir.localCheckpoint()
    nodes = bidir.select(F.col("dst").alias("u")).distinct()
    seeds = nodes.orderBy("u").limit(_BFS_SEEDS)  # TakeOrdered, reseed-safe
    dist = seeds.withColumn("dist", F.lit(0).cast("int")).localCheckpoint()
    frontier = seeds
    for k in range(1, _BFS_ROUNDS + 1):
        nxt = (
            frontier.withColumnRenamed("u", "src")
            .join(bidir, "src")
            .select(F.col("dst").alias("u"))
            .distinct()
        )
        new = (
            nxt.join(dist, "u", "left_anti")
            .withColumn("dist", F.lit(k).cast("int"))
            .localCheckpoint()
        )
        dist = dist.unionByName(new)
        frontier = new.select("u")
    return dist.select(
        F.col("u").cast("bigint").alias("user_id"), F.col("dist").cast("int").alias("dist")
    )


