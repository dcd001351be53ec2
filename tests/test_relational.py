"""Differential tests: every oracle-backed query vs DuckDB at sf0.001,
plus semantics pytest can check that the hash-compare can't (ordering,
approx tolerances)."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

import sparkflow
from tools.check import compare


@pytest.mark.parametrize("name", sorted(sparkflow.ORACLES))
def test_oracle_match(spark, duck, sf_small, name):
    sdf = sparkflow.QUERIES[name](spark, sf_small).toPandas()
    odf = duck(sf_small).execute(sparkflow.ORACLES[name]).fetchdf()
    verdict = compare(sdf, odf)
    assert verdict in ("EXACT", "CLOSE"), f"{name}: {verdict}"
    # EXACT is the bar: CLOSE means hash-fragile floats
    assert verdict == "EXACT", f"{name} only tolerance-equal: {verdict}"


def test_sort_multi_orders_rows(spark, sf_small):
    pdf = sparkflow.QUERIES["sort_multi"](spark, sf_small).toPandas()
    key = list(zip(pdf["s_nationkey"], -pdf["s_acctbal"], pdf["s_suppkey"]))
    assert key == sorted(key), "sort_multi must return globally ordered rows"


def test_limit_topk_is_top10(spark, duck, sf_small):
    pdf = sparkflow.QUERIES["limit_topk"](spark, sf_small).toPandas()
    assert len(pdf) == 10
    assert pdf["revenue"].is_monotonic_decreasing


def test_approx_distinct_within_tolerance(spark, sf_small):
    approx = sparkflow.QUERIES["agg_approx_distinct"](spark, sf_small).toPandas()
    exact = (
        sparkflow.QUERIES["agg_distinct"](spark, sf_small)
        .toPandas()
        .set_index("event_type")["n_users"]
    )
    for _, row in approx.iterrows():
        e = exact[row["event_type"]]
        assert abs(row["approx_users"] - e) <= 0.1 * e + 3


def test_percentile_approx_near_exact(spark, sf_small):
    from pyspark.sql import functions as F

    from sparkflow.catalog import table

    o = table(spark, sf_small, "orders")
    both = (
        o.groupBy("o_orderpriority")
        .agg(
            F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_med"),
            F.median("o_totalprice").alias("exact_med"),
        )
        .toPandas()
    )
    assert np.allclose(both["approx_med"], both["exact_med"], rtol=0.02)


def test_union_all_count_invariant(spark, sf_small):
    """Algebraic invariant: |A ∪all B| = |A| + |B|."""
    from pyspark.sql import functions as F

    from sparkflow.catalog import table

    ev = table(spark, sf_small, "events")
    a = ev.filter(F.col("event_type") == "click").count()
    b = ev.filter(F.col("event_type") == "purchase").count()
    assert sparkflow.QUERIES["set_union_all"](spark, sf_small).count() == a + b


def test_running_sum_final_equals_group_total(spark, sf_small):
    """Last cumulative value per customer == plain grouped sum."""
    run = sparkflow.QUERIES["win_running_sum"](spark, sf_small).toPandas()
    final = run.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]).groupby(
        "o_custkey"
    )["running_revenue"].last()
    from sparkflow.catalog import table
    from sparkflow.oracle_compat import dsum

    tot = (
        table(spark, sf_small, "orders")
        .groupBy("o_custkey")
        .agg(dsum("o_totalprice", "total"))
        .toPandas()
        .set_index("o_custkey")["total"]
    )
    assert np.allclose(final.sort_index(), tot.sort_index())


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"nation", "revenue"}
