"""Helpers that keep Spark results bit-identical to the DuckDB oracle.

The driver hash-compares values, so floating-point aggregation order
must not leak into results. Policy (SURVEY §7 M1 "oracle compatibility
helper"):

- money sums / averages: route through ``decimal(12,2)`` — decimal
  addition is exact and associative, so Spark's partial/final
  aggregation over any partitioning equals DuckDB's single-threaded sum
  bit-for-bit; the final cast decimal->double is deterministic and
  identical in both engines. The source doubles are exact 2-decimal
  values (verified in FIXTURES.md) so the input cast is lossless.
- statistical aggregates (stddev/var/corr/skew, approx percentiles):
  different engines use different accumulation algorithms; round the
  *output* to a few decimals in BOTH engines.
- counts/min/max: naturally exact.

At 100 TB the decimal path costs ~nothing (decimal(12,2) is a fixed
8-byte physical type inside Tungsten) and buys run-to-run determinism —
a property worth having in production, not just for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(12,2)"


def dec(c: Column | str) -> Column:
    """Lossless cast of an exact-2-decimal double column to decimal."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(DEC)


def dsum(c: Column | str, alias: str) -> Column:
    """Exact, order-independent sum of a 2-decimal money column, as double."""
    return F.sum(dec(c)).cast("double").alias(alias)


def davg(c: Column | str, alias: str) -> Column:
    """Exact-sum / exact-count average (double division of identical
    operands is identical IEEE math in both engines)."""
    c = F.col(c) if isinstance(c, str) else c
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)


def revenue(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """TPC-H revenue term ``price * (1 - discount)`` in exact decimal
    arithmetic: decimal(12,2) * decimal(13,2) -> decimal(26,4), well under
    the 38-digit cap, summable without overflow at any SF."""
    return dec(price) * (F.lit(1).cast(DEC) - dec(disc))


# The matching DuckDB SQL fragments, so oracles are written once.
SQL_DEC = "DECIMAL(12,2)"


def sql_dsum(expr: str, alias: str) -> str:
    """For raw 2-decimal double columns (cast then sum)."""
    return f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE) AS {alias}"


def sql_dsum_expr(expr: str, alias: str) -> str:
    """For expressions that are ALREADY exact decimals (e.g. sql_revenue's
    scale-4 product) — re-casting to (12,2) would round per-row."""
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE) / COUNT({expr})) AS {alias}"


def sql_revenue(price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    return (
        f"CAST({price} AS {SQL_DEC}) * "
        f"(CAST(1 AS {SQL_DEC}) - CAST({disc} AS {SQL_DEC}))"
    )
