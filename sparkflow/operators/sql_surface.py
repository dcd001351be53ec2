"""SQL API surface (SURVEY §2 r2 addition): the same engine through
``spark.sql`` — what a Flink Table-API/SQL user writes instead of the
DataFrame builders everywhere else in this package.

One registered query exercises the SQL features those users lean on in
a single statement: CTEs, an uncorrelated scalar subquery, a correlated
EXISTS, and a window function. Catalyst compiles this to the same
physical operators as the DataFrame API (subqueries become broadcast
semi-joins / scalar broadcast exchanges), so nothing here needs new
execution machinery — which is the point being demonstrated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import register

_SQL = """
    WITH cust_totals AS (
      SELECT o_custkey,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents,
             COUNT(*) AS n_orders
      FROM {orders} GROUP BY o_custkey
    )
    SELECT c.o_custkey AS custkey,
           CAST(c.total_cents AS DOUBLE) / 100.0 AS total_value,
           c.n_orders,
           RANK() OVER (ORDER BY c.total_cents DESC, c.o_custkey) AS spend_rank
    FROM cust_totals c
    WHERE c.total_cents > (SELECT 2 * AVG(total_cents) FROM cust_totals)
      AND EXISTS (SELECT 1 FROM {orders} o
                  WHERE o.o_custkey = c.o_custkey
                    AND o.o_orderstatus = 'F')
    ORDER BY spend_rank
"""


@register(
    "sql_pipeline",
    oracle=_SQL.format(orders="orders"),
)
def sql_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big spenders via pure SQL: CTE totals (exact integer cents), an
    uncorrelated scalar subquery for the 2×-average threshold, a
    correlated EXISTS, and a rank window — the oracle IS the same text
    modulo the view name, which is the SQL surface's compatibility
    claim. The global rank window is bounded: it ranks only the
    big-spender survivors (a few rows per thousand customers), not the
    base table."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("sparkflow_sql_orders")
    return spark.sql(_SQL.format(orders="sparkflow_sql_orders"))


@register(
    "sql_merge_upsert",
    oracle="""
    WITH src AS (
      SELECT o_custkey AS k,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS delta_cents
      FROM orders WHERE o_orderstatus = 'F'
      GROUP BY o_custkey
    ),
    source AS (
      SELECT k, delta_cents FROM src
      UNION ALL
      SELECT k + 1000000, delta_cents FROM src WHERE k < 50
    ),
    tgt AS (
      SELECT c_custkey, c_name,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
      FROM customer
    )
    SELECT COALESCE(t.c_custkey, s.k) AS c_custkey,
           COALESCE(t.c_name, 'NEW') AS c_name,
           CAST(COALESCE(t.bal_cents, 0) + COALESCE(s.delta_cents, 0)
                AS DOUBLE) / 100.0 AS c_acctbal_new,
           CASE WHEN t.c_custkey IS NULL THEN 'insert'
                WHEN s.k IS NULL THEN 'noop'
                ELSE 'update' END AS merge_action
    FROM tgt t FULL OUTER JOIN source s ON t.c_custkey = s.k
    """,
)
def sql_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation (upsert): apply per-customer order deltas to
    the customer balance — WHEN MATCHED update, WHEN NOT MATCHED insert
    (synthetic new keys), untouched target rows pass through ('noop').
    Spark's MERGE INTO statement needs a v2/ACID table; on plain files
    the equivalent is this full-outer-join + coalesce rewrite, which is
    also exactly the physical plan MERGE compiles to (a full outer hash
    join on the merge key) — one shuffle of each side at any scale.
    Money moves through integer cents so the merged balances are
    bit-identical to the oracle."""
    from pyspark.sql import functions as F

    from ..oracle_compat import cents

    src = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.sum(cents("o_totalprice")).alias("delta_cents"))
    )
    source = src.unionByName(
        src.filter(F.col("k") < 50).select(
            (F.col("k") + 1000000).alias("k"), "delta_cents"
        )
    )
    tgt = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", cents("c_acctbal").alias("bal_cents")
    )
    merged = tgt.join(source, tgt.c_custkey == source.k, "full_outer")
    return merged.select(
        F.coalesce(tgt.c_custkey, source.k).alias("c_custkey"),
        F.coalesce(tgt.c_name, F.lit("NEW")).alias("c_name"),
        (
            (
                F.coalesce(F.col("bal_cents"), F.lit(0))
                + F.coalesce(F.col("delta_cents"), F.lit(0))
            ).cast("double")
            / 100.0
        ).alias("c_acctbal_new"),
        F.when(tgt.c_custkey.isNull(), "insert")
        .when(source.k.isNull(), "noop")
        .otherwise("update")
        .alias("merge_action"),
    )


_RECURSIVE_SQL = """
    WITH RECURSIVE edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT event_type AS src,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM {events}
      ) t
      WHERE dst IS NOT NULL AND dst <> src
    ),
    walk(node, hops) AS (
      SELECT 'signup', 0
      UNION ALL
      SELECT e.dst, w.hops + 1
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.hops < 3
    )
    SELECT node, MIN(hops) AS min_hops, COUNT(*) AS n_walks
    FROM walk
    GROUP BY node
    ORDER BY min_hops, node
"""


# the same statement split at the edges/walk boundary for the Spark
# side (r17): the edges CTE materializes once per invocation so the
# UnionLoop's per-iteration re-execution only touches the tiny walk
# join; concatenated they are semantically the _RECURSIVE_SQL the
# oracle still runs whole.
_EDGES_SQL = """
    SELECT DISTINCT src, dst FROM (
      SELECT event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM {events}
    ) t
    WHERE dst IS NOT NULL AND dst <> src
"""

_WALK_SQL = """
    WITH RECURSIVE walk(node, hops) AS (
      SELECT 'signup', 0
      UNION ALL
      SELECT e.dst, w.hops + 1
      FROM walk w JOIN {edges} e ON e.src = w.node
      WHERE w.hops < 3
    )
    SELECT node, MIN(hops) AS min_hops, COUNT(*) AS n_walks
    FROM walk
    GROUP BY node
    ORDER BY min_hops, node
"""


@register(
    "sql_recursive",
    oracle=_RECURSIVE_SQL.format(events="events"),
)
def sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE — the Flink iterative /
    Table-API-connect-by gap, closed in SQL): BFS over the event-type
    transition graph. Edges are DISTINCT consecutive per-user
    transitions (lead over (user_id, ts)); the recursion expands walks
    from the 'signup' seed up to 3 hops, then aggregates min-hop
    distance and bounded-walk counts per reachable node. The oracle is
    the SAME statement text — DuckDB and Spark 4 share the syntax.

    Scale: each recursion step is one self-join against the edge table —
    Catalyst plans it as iterated joins with the depth bound as the
    termination guard. The edge table is vocabulary-sized (|types|²
    rows regardless of event count), so every step is a broadcast join;
    the only data-sized work is the one window pass deriving edges. For
    unbounded-depth reachability on big graphs, pointer doubling
    (llm_dedup_clusters) is the O(log d) alternative.

    r17 (guide §3.3 — materialize to truncate a repeated subtree): the
    UnionLoop executor re-runs the recursive term's WHOLE subplan every
    iteration, edges window included (measured at sf0.1: full op
    2.28 s = 4 iterations × 0.27 s edges pass + 0.79 s loop machinery).
    The edges CTE is therefore localCheckpoint'ed ONCE per invocation —
    a vocabulary-bounded table (|types|² rows — 20 here — at ANY event
    count), so the materialization is O(1)-sized and the data-sized
    window pass runs exactly once. This is the one place in the repo
    where the r16 anti-checkpoint finding inverts: the loop executor
    has no stage cache across iterations, so the repeated subtree is
    REALLY re-executed (interleaved A/B at sf0.1: 3.11 s → 1.63 s
    median, 0.53×). Same rows: the recursion consumes the identical
    edge set."""
    table(spark, sf_dir, "events").createOrReplaceTempView("sparkflow_sql_events")
    edges = spark.sql(
        _EDGES_SQL.format(events="sparkflow_sql_events")
    ).localCheckpoint()
    edges.createOrReplaceTempView("sparkflow_sql_edges")
    return spark.sql(_WALK_SQL.format(edges="sparkflow_sql_edges"))


_CORRELATED_EXISTS_SQL = """
    SELECT o.o_orderpriority, COUNT(*) AS n_late_risk_orders
    FROM {orders} o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM {lineitem} l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
"""


@register(
    "sql_correlated_exists",
    oracle=_CORRELATED_EXISTS_SQL.format(orders="orders", lineitem="lineitem"),
)
def sql_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of 1996 orders having at least
    one line item shipped >90 days after the order date — a correlated
    EXISTS whose inner predicate references BOTH sides. Catalyst
    decorrelates this into a left-semi hash join on l_orderkey with the
    date comparison as the join filter — one shuffle each side, no
    per-row subquery execution ever happens (the thing that makes
    correlated EXISTS usable at 100 TB). The oracle is the same
    statement text."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("sparkflow_sql_orders")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("sparkflow_sql_lineitem")
    return spark.sql(
        _CORRELATED_EXISTS_SQL.format(
            orders="sparkflow_sql_orders", lineitem="sparkflow_sql_lineitem"
        )
    )


_SCALAR_SUBQUERY_SQL = """
    SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 700.0 AS avg_weekly_small_lot_value
    FROM {lineitem} l JOIN {part} p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                          FROM {lineitem} l2
                          WHERE l2.l_partkey = l.l_partkey)
"""


@register(
    "sql_scalar_subquery",
    oracle=_SCALAR_SUBQUERY_SQL.format(lineitem="lineitem", part="part"),
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: value locked in small-lot orders of one brand,
    where 'small' is defined per part by a CORRELATED SCALAR subquery
    (half the part's average quantity). Catalyst rewrites the subquery
    into a per-partkey aggregate joined back to the probe — the
    decorrelation that turns O(rows × subquery) into two shuffles.
    Exactness: l_quantity is integer-valued in this data, so AVG is a
    sum of exactly-representable doubles (order-independent) and the
    threshold comparison is deterministic; money is integer cents."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("sparkflow_sql_lineitem")
    table(spark, sf_dir, "part").createOrReplaceTempView("sparkflow_sql_part")
    return spark.sql(
        _SCALAR_SUBQUERY_SQL.format(
            lineitem="sparkflow_sql_lineitem", part="sparkflow_sql_part"
        )
    )


_NESTED_IN_SQL = """
    SELECT c.c_custkey, c.c_name, COUNT(*) AS n_big_orders,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS big_order_value
    FROM {customer} c JOIN {orders} o ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM {lineitem}
        GROUP BY l_orderkey
        HAVING SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) > 30000
    )
    GROUP BY c.c_custkey, c.c_name
"""


@register(
    "sql_nested_in",
    oracle=_NESTED_IN_SQL.format(
        customer="customer", orders="orders", lineitem="lineitem"
    ),
)
def sql_nested_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total line
    quantity exceeds a threshold, found via IN over a grouped+HAVING
    subquery, rolled up per customer. The IN-subquery becomes a
    left-semi join against the aggregated orderkey set — the aggregation
    shrinks lineitem to one row per order BEFORE the join, so the semi
    join probe is order-sized, not line-sized. Quantities compare in
    exact integer cents."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("sparkflow_sql_customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("sparkflow_sql_orders")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("sparkflow_sql_lineitem")
    return spark.sql(
        _NESTED_IN_SQL.format(
            customer="sparkflow_sql_customer",
            orders="sparkflow_sql_orders",
            lineitem="sparkflow_sql_lineitem",
        )
    )


_EXISTS_CHAIN_SQL = """
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_solo_lines
    FROM {supplier} s
    JOIN {lineitem} l ON l.l_suppkey = s.s_suppkey
    WHERE EXISTS (SELECT 1 FROM {lineitem} l2
                  WHERE l2.l_orderkey = l.l_orderkey
                    AND l2.l_linenumber <> l.l_linenumber)
      AND NOT EXISTS (SELECT 1 FROM {lineitem} l3
                      WHERE l3.l_orderkey = l.l_orderkey
                        AND l3.l_suppkey <> l.l_suppkey)
    GROUP BY s.s_suppkey, s.s_name
"""


@register(
    "sql_exists_chain",
    oracle=_EXISTS_CHAIN_SQL.format(supplier="supplier", lineitem="lineitem"),
)
def sql_exists_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: lines on multi-line orders where this supplier is
    the ONLY supplier — an EXISTS and a NOT EXISTS against the same
    fact, both correlated on the outer line. Catalyst plans the pair as
    a left-semi then a left-anti hash join on l_orderkey (the anti join
    is the scalable NOT EXISTS — no per-row probing). Counts only, so
    no float hazards."""
    table(spark, sf_dir, "supplier").createOrReplaceTempView("sparkflow_sql_supplier")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("sparkflow_sql_lineitem")
    return spark.sql(
        _EXISTS_CHAIN_SQL.format(
            supplier="sparkflow_sql_supplier", lineitem="sparkflow_sql_lineitem"
        )
    )
