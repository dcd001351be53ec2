"""Property-based invariants (hypothesis) — SURVEY §5.4.

Each example runs real Spark jobs, so example counts are kept small;
deadline disabled (JVM warm-up noise)."""

from __future__ import annotations

import sys

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from sparkflow.catalog import table
from sparkflow.oracle_compat import cents

SF = "/root/testdata/sf0.001"
_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from sparkflow.session import get_spark

        _spark = get_spark("sparkflow-props", shuffle_partitions=4)
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


@settings(max_examples=5, deadline=None)
@given(st.floats(min_value=0, max_value=600000, allow_nan=False))
def test_filter_partition_invariant(threshold):
    """filter(p) and filter(NOT p) partition the table for any predicate."""
    spark = _get_spark()
    o = table(spark, SF, "orders")
    total = o.count()
    above = o.filter(F.col("o_totalprice") > threshold).count()
    below = o.filter(~(F.col("o_totalprice") > threshold)).count()
    assert above + below == total


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=1, max_value=48))
def test_tumbling_buckets_partition_events(hours):
    """Any tumbling bucket width partitions events: bucket counts sum to
    the table count (no row lost or double-bucketed)."""
    spark = _get_spark()
    ev = table(spark, SF, "events")
    total = ev.count()
    secs = hours * 3600
    bucketed = (
        ev.groupBy(
            F.expr(
                f"timestamp_micros(((unix_micros(ts) div 1000000) div {secs})"
                f" * {secs} * 1000000)"
            ).alias("bucket")
        )
        .count()
        .agg(F.sum("count"))
        .collect()[0][0]
    )
    assert bucketed == total


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=2, max_value=10))
def test_cents_sum_scale_consistency(divisor):
    """Exact-cents sums are linear: sum(x)/d == sum over pre-divided
    partitions recombined — i.e. splitting the data arbitrarily and
    summing cents per split always recombines to the global sum."""
    spark = _get_spark()
    li = table(spark, SF, "lineitem")
    total = li.agg(F.sum(cents("l_extendedprice"))).collect()[0][0]
    per_split = (
        li.groupBy(F.col("l_orderkey") % divisor)
        .agg(F.sum(cents("l_extendedprice")).alias("s"))
        .agg(F.sum("s"))
        .collect()[0][0]
    )
    assert total == per_split


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.sampled_from(["join", "filter", "scan", "merge", "window", "index"]),
        min_size=1,
        max_size=4,
        unique=True,
    )
)
def test_keyword_score_bounded(keywords):
    spark = _get_spark()
    d = table(spark, SF, "documents")
    score = sum(
        F.when(F.col("text").contains(kw), 1).otherwise(0) for kw in keywords
    )
    mx = d.select(score.alias("s")).agg(F.max("s")).collect()[0][0]
    assert 0 <= mx <= len(keywords)


@given(
    st.lists(
        st.floats(min_value=-5, max_value=5, allow_nan=False, width=32),
        min_size=4,
        max_size=64,
    ),
    st.lists(
        st.floats(min_value=-5, max_value=5, allow_nan=False, width=32),
        min_size=4,
        max_size=64,
    ),
)
@settings(max_examples=200, deadline=None)
def test_fixed_point_cosine_error_bound(a, b):
    """The fixed-point (1e-6 quantized) cosine used by the similarity
    ops must stay within ~1e-4 of the float cosine for unit-scale
    vectors (no Spark needed — pure numpy, same code path as the UDF)."""
    import numpy as np

    n = min(len(a), len(b))
    A = np.array(a[:n], dtype=np.float64)
    B = np.array(b[:n], dtype=np.float64)
    na, nb = np.linalg.norm(A), np.linalg.norm(B)
    if na < 1e-3 or nb < 1e-3:
        return  # degenerate: quantization noise dominates near zero
    Ai = np.floor(A * 1_000_000 + 0.5).astype(np.int64)
    Bi = np.floor(B * 1_000_000 + 0.5).astype(np.int64)
    fxp = (Ai @ Bi) / (np.sqrt(float(Ai @ Ai)) * np.sqrt(float(Bi @ Bi)))
    ref = (A @ B) / (na * nb)
    assert abs(fxp - ref) < 1e-4


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=10, max_value=900))
def test_binned_band_join_equals_naive(band_secs):
    """For any band width, the bin-bucketed band join must return exactly
    the naive theta-join counts (bins are an optimization, not a
    semantics change)."""
    spark = _get_spark()
    ev = table(spark, SF, "events")
    band_us = band_secs * 1_000_000
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), F.unix_micros("ts").alias("cu")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.unix_micros("ts").alias("pu")
    )
    naive = (
        c.join(p, (F.col("pu") >= F.col("cu")) & (F.col("pu") < F.col("cu") + band_us), "left")
        .groupBy("cid")
        .agg(F.count("pid").alias("n"))
        .toPandas()
        .set_index("cid")["n"]
        .sort_index()
    )
    cb = c.withColumn(
        "bin_id", F.explode(F.array(F.floor(F.col("cu") / band_us), F.floor(F.col("cu") / band_us) + 1))
    )
    pb = p.withColumn("bin_id", F.floor(F.col("pu") / band_us))
    binned = (
        cb.join(pb, "bin_id", "left")
        .groupBy("cid")
        .agg(
            F.count_if(
                F.coalesce(
                    (F.col("pu") >= F.col("cu")) & (F.col("pu") < F.col("cu") + band_us),
                    F.lit(False),
                )
            ).alias("n")
        )
        .toPandas()
        .set_index("cid")["n"]
        .sort_index()
    )
    assert (naive == binned).all()
