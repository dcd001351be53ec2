"""Helpers that keep Spark results bit-identical to the DuckDB oracle.

The driver hash-compares values, so floating-point aggregation order
must not leak into results. Policy (SURVEY §7 M1 "oracle compatibility
helper"):

- money sums / averages: convert to integer minor units with
  ``floor(x*scale + 0.5)`` (the data's money doubles are exact
  2-decimal values — FIXTURES.md), sum as long (exact, associative,
  order-independent across any partitioning), divide back once. The
  floor() spelling matters: it's a codegen'd intrinsic in Spark, ~3×
  faster than round()/decimal aggregation which detour through
  BigDecimal per row — and the identical double expression evaluates
  identically in DuckDB. Derived products (price*(1-disc)[*(1+tax)])
  are exact 4/6-decimal rationals computed identically as IEEE doubles
  in both engines, so scaled flooring lands on the same integer.
- statistical aggregates (stddev/var/corr/skew, percentile
  interpolation): engines accumulate differently; round the *output*.
- counts/min/max: naturally exact.

Overflow headroom: int64 carries ~9.2e18 — at 100 TB, sum partial
aggregation stays in range for cents of realistic money columns; for
larger magnitudes switch scale or use decimal (the slow exact path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _colify(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def cents(c: Column | str, scale: int = 100) -> Column:
    """Exact integer minor units of a money double (floor(x*s + .5):
    round-half-up that both engines compute identically, valid because
    true values are exact 2-decimal rationals ≫ 0.5 ulp from midpoints)."""
    return F.floor(_colify(c) * scale + F.lit(0.5)).cast("long")


def dsum(c: Column | str, alias: str, scale: int = 100) -> Column:
    """Exact, order-independent sum of a money column, as double."""
    return (F.sum(cents(c, scale)).cast("double") / float(scale)).alias(alias)


def davg(c: Column | str, alias: str) -> Column:
    """Exact-sum / exact-count average (double division of identical
    operands is identical IEEE math in both engines)."""
    c = _colify(c)
    return ((F.sum(cents(c)).cast("double") / 100.0) / F.count(c)).alias(alias)


def revenue_units(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """TPC-H revenue term ``price * (1 - discount)`` in exact 1e-4 units
    (product of 2-decimal rationals is a 4-decimal rational)."""
    prod = F.col(price) * (F.lit(1) - F.col(disc))
    return F.floor(prod * 10000 + F.lit(0.5)).cast("long")


def rev_sum(alias: str, price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    return (F.sum(revenue_units(price, disc)).cast("double") / 10000.0).alias(alias)


# ---- matching DuckDB SQL fragments, so oracles are written once ----


def sql_cents(expr: str, scale: int = 100) -> str:
    return f"CAST(FLOOR(({expr}) * {scale} + 0.5) AS BIGINT)"


def sql_dsum(expr: str, alias: str, scale: int = 100) -> str:
    return f"(CAST(SUM({sql_cents(expr, scale)}) AS DOUBLE) / {scale}.0) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"((CAST(SUM({sql_cents(expr)}) AS DOUBLE) / 100.0) / COUNT({expr})) AS {alias}"
    )


def sql_rev_sum(alias: str, price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    return (
        f"(CAST(SUM(CAST(FLOOR({price} * (1 - {disc}) * 10000 + 0.5) AS BIGINT)) "
        f"AS DOUBLE) / 10000.0) AS {alias}"
    )


# window-function variants (OVER clause appended by the caller)
def sql_win_dsum(expr: str, over: str) -> str:
    return f"(CAST(SUM({sql_cents(expr)}) OVER {over} AS DOUBLE) / 100.0)"
