"""Projection & filter operators (SURVEY §2.2).

Flink-side equivalent: `map()` / `filter()` on a DataStream. Spark-first:
plain Column algebra so Catalyst folds constants, prunes columns, and
pushes every predicate into the parquet scan (verify with
`.explain()` → `PushedFilters`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


@register(
    "project_select",
    oracle="""
    SELECT p_partkey AS part_id, p_name AS part_name, p_brand AS brand
    FROM part
    """,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning + rename — the scan should read exactly 3 columns."""
    return table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("part_id"),
        F.col("p_name").alias("part_name"),
        F.col("p_brand").alias("brand"),
    )


@register(
    "project_computed",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           CASE WHEN l_returnflag = 'R' THEN 'returned'
                WHEN l_linestatus = 'O' THEN 'open'
                ELSE 'done' END AS status_label,
           COALESCE(NULLIF(l_tax, 0.0), -1.0) AS tax_or_flag
    FROM lineitem
    """,
)
def project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic, CASE WHEN, coalesce/nullif — all JVM-side expressions.
    (Per-row double product is identical IEEE math in both engines; only
    multi-row accumulation needs the decimal path.)"""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("net_price"),
        F.when(F.col("l_returnflag") == "R", "returned")
        .when(F.col("l_linestatus") == "O", "open")
        .otherwise("done")
        .alias("status_label"),
        F.coalesce(F.nullif(F.col("l_tax"), F.lit(0.0)), F.lit(-1.0)).alias("tax_or_flag"),
    )


@register(
    "filter_predicate",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 300000
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE (o_orderstatus IN ('F', 'P') OR o_orderpriority LIKE '1-%')
      AND o_totalprice BETWEEN 100000 AND 400000
      AND o_orderdate IS NOT NULL
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/IN/BETWEEN/LIKE/IS NULL in one predicate tree."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus").isin("F", "P") | F.col("o_orderpriority").like("1-%"))
        & F.col("o_totalprice").between(100000, 400000)
        & F.col("o_orderdate").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
