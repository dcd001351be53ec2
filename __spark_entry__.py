"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``sparkflow`` package; this module is a
thin adapter over its registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import sparkflow


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5-shape 5-way star join) on sf0.001."""
    return sparkflow.QUERIES["join_multiway_star"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(sparkflow.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query key; omitted keys → rows-only check."""
    return dict(sparkflow.ORACLES)
