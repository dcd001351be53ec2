"""Physical-plan inspection helpers (the `.explain("formatted")` loop).

The 100 TB contract for every operator is checked here, mechanically:
filters push into the parquet scan, projections prune the read schema,
dimension joins broadcast instead of shuffling, top-k compiles to
TakeOrderedAndProject. tests/test_plans.py asserts these properties so a
regression in plan shape fails CI, not just a benchmark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_has(df: DataFrame, *needles: str) -> dict[str, bool]:
    text = formatted_plan(df)
    return {n: (n in text) for n in needles}


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lines from the formatted plan (one per scan)."""
    return [
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    ]


def read_schemas(df: DataFrame) -> list[str]:
    return [
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "ReadSchema" in line
    ]
