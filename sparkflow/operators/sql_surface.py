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
