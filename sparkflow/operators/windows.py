"""Analytic window functions (SURVEY §2.5).

Flink-side equivalents: Table API Top-N / OVER windows; in DataStream
terms these are KeyedProcessFunction patterns holding a ValueState of
the previous record (lag), a running accumulator (cumulative sum), or a
bounded buffer (sliding rows).

Spark-first: `Window.partitionBy().orderBy()` — one shuffle on the
partition key, sorted within partitions, no per-row Python. Every window
ordering includes a unique tiebreaker column so results are total-ordered
and deterministic (SURVEY §7 M1 gotcha).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..oracle_compat import cents
from ..registry import register


@register(
    "win_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rn <= 3
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (Flink Table Top-N). row_number with a
    unique tiebreaker (o_orderkey) so ranks are deterministic."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "win_rank_dense_ntile",
    oracle="""
    SELECT s_suppkey, s_name,
           RANK()       OVER (ORDER BY ROUND(s_acctbal, 0) DESC) AS bal_rank,
           DENSE_RANK() OVER (ORDER BY ROUND(s_acctbal, 0) DESC) AS bal_dense_rank,
           NTILE(4)     OVER (ORDER BY s_acctbal DESC, s_suppkey) AS bal_quartile
    FROM supplier
    """,
)
def win_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank (on a coarsened key so ties actually occur and
    the three functions genuinely differ) + ntile quartiles — via a
    BANDED TWO-PASS plan, never a global single-task window.

    A naive ``Window.orderBy(...)`` with no partitionBy shuffles every
    row to ONE task — fatal at scale. Instead:

    1. Range-band the table on the sort key (percentile_approx cut
       points, broadcast). ``round`` is monotone in ``s_acctbal``, so
       banding on the COARSE key is order-consistent for the exact
       ``(s_acctbal DESC, s_suppkey)`` ntile ordering too, and equal
       coarse keys always share a band (required for rank/dense_rank).
    2. rank/dense_rank/row_number within each band in parallel
       (``Window.partitionBy("band")``).
    3. Recover global values by adding per-band offsets (cumulative
       row / distinct-key counts of earlier bands) computed from a
       B-row band-stats table via a broadcast triangular self-join —
       O(B²) on B=8 rows, so the plan contains NO unpartitioned Window
       or single-partition Exchange (asserted in tests/test_plans.py).

    ntile(k) is reconstructed from the global row_number by the SQL
    NTILE definition: with n rows, q=n//k, r=n%k, the first r buckets
    get q+1 rows, the rest q."""
    n_bands, k = 8, 4
    s = table(spark, sf_dir, "supplier")
    coarse = F.round("s_acctbal", 0)

    # pass 0: broadcast B-1 deterministic cut points on the coarse key
    cuts = s.select(
        F.percentile_approx(coarse, [i / n_bands for i in range(1, n_bands)], 10000).alias(
            "cuts"
        )
    )
    banded = s.crossJoin(F.broadcast(cuts)).withColumn(
        # descending order: band 0 holds the largest keys; equal coarse
        # keys get equal bands (strict < against every cut point)
        "band",
        F.size(F.filter("cuts", lambda c: coarse < c)),
    )

    # pass 1: per-band window functions (parallel across bands)
    wb = Window.partitionBy("band").orderBy(coarse.desc())
    wx = Window.partitionBy("band").orderBy(F.col("s_acctbal").desc(), "s_suppkey")
    local = banded.select(
        "s_suppkey",
        "s_name",
        "band",
        F.rank().over(wb).alias("rk"),
        F.dense_rank().over(wb).alias("drk"),
        F.row_number().over(wx).alias("rn"),
    )

    # band stats → cumulative offsets via triangular self-join (B rows)
    stats = banded.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(coarse).alias("n_keys"),
    )
    a, b = stats.alias("a"), stats.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b.band") < F.col("a.band"), "left")
        .groupBy(F.col("a.band").alias("band"))
        .agg(
            F.coalesce(F.sum("b.n_rows"), F.lit(0)).alias("off_rows"),
            F.coalesce(F.sum("b.n_keys"), F.lit(0)).alias("off_keys"),
        )
    )
    total = stats.agg(F.sum("n_rows").alias("n_total"))

    g_rn = F.col("rn") + F.col("off_rows")  # global row_number
    q = F.floor(F.col("n_total") / k)
    r = F.col("n_total") % k
    ntile = F.when(
        g_rn <= r * (q + 1), F.ceil(g_rn / (q + 1))
    ).otherwise(r + F.ceil((g_rn - r * (q + 1)) / F.greatest(q, F.lit(1))))
    return (
        local.join(F.broadcast(offsets), "band")
        .crossJoin(F.broadcast(total))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rk") + F.col("off_rows")).alias("bal_rank"),
            (F.col("drk") + F.col("off_keys")).alias("bal_dense_rank"),
            ntile.cast("int").alias("bal_quartile"),
        )
    )


@register(
    "win_distribution",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(PERCENT_RANK() OVER w, 9) AS price_pct_rank,
           ROUND(CUME_DIST() OVER w, 9) AS price_cume_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist of each order's price within its
    customer's history — the distribution functions completing the
    ranking family. Partitioned on a HIGH-CARDINALITY key (custkey
    grows with the data, so parallelism scales; a low-cardinality key
    like the 5 order priorities would cap the stage at 5 tasks — for a
    global distribution use the banded two-pass shape of
    win_rank_dense_ntile). Unique tiebreaker; exact: both functions are
    ratios of integer counts, so the doubles agree bit-for-bit."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.percent_rank().over(w), 9).alias("price_pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("price_cume_dist"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
           LAG(ts)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts,
           (epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)))
                // 1000000 AS gap_seconds
    FROM events
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user previous/next event + gap — the ValueState(prev record)
    KeyedProcessFunction pattern as a single window pass."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        prev.alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        # whole-second gap: diff in µs then integer-divide (gaps are >= 0
        # within the ascending order, so floor == trunc in both engines)
        ((F.unix_micros(F.col("ts")) - F.unix_micros(prev)) / F.lit(1000000))
        .cast("long")
        .alias("gap_seconds"),
    )


@register(
    "win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           (CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100.0) AS running_revenue
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer over order date (keyed running
    aggregate). Integer-cents accumulation keeps every prefix sum exact."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.sum(cents("o_totalprice")).over(w).cast("double") / 100.0).alias("running_revenue"),
    )


@register(
    "win_sliding_rows",
    oracle="""
    SELECT event_id, user_id, value,
           (CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0)
             / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
             AS moving_avg
    FROM events
    """,
)
def win_sliding_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over the last 4 rows per user (Flink count window):
    exact cents sum / count, so partial-window edges are exact too."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "value",
        (
            (F.sum(cents("value")).over(w).cast("double") / 100.0)
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           (CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY EPOCH(o_orderdate)
                      RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100.0) AS revenue_7d
    FROM orders
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on epoch seconds: same-customer revenue within the
    trailing 7 days — the event-time range-state pattern. Range frames
    need no tiebreaker: equal timestamps share one frame by definition."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-604800, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.sum(cents("o_totalprice")).over(w).cast("double") / 100.0).alias("revenue_7d"),
    )


@register(
    "win_value_fns",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey)  OVER w AS last_key,
           nth_value(o_orderkey, 2) OVER w AS second_key
    FROM orders
    WHERE o_custkey % 8 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_value_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value functions (first_value / last_value / nth_value) over
    each customer's order history in date order. The frame is explicitly
    UNBOUNDED..UNBOUNDED: last_value under the default frame (..CURRENT
    ROW) is a classic SQL trap that silently returns the current row —
    both engines get the full-frame semantics here, and the (date, key)
    order is total so every value is deterministic. The ~12% sample cap
    is a modulo cut — offset-robust on any integer-keyed corpus
    (tools/reseed.py differential)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 8 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


# Shared by win_ewma and win_ewma_segmented: the two operators compute
# the SAME function (identical doubles), differing only in physical
# partitioning — a single oracle text keeps that claim checkable.
_EWMA_ORACLE = """
    WITH c AS (
      SELECT user_id, event_id, ts,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
      FROM events
    )
    SELECT user_id, event_id,
           (  v * 0.5
            + COALESCE(LAG(v, 1) OVER w, 0) * 0.25
            + COALESCE(LAG(v, 2) OVER w, 0) * 0.125
            + COALESCE(LAG(v, 3) OVER w, 0) * 0.0625
            + COALESCE(LAG(v, 4) OVER w, 0) * 0.03125
            + COALESCE(LAG(v, 5) OVER w, 0) * 0.015625
            + COALESCE(LAG(v, 6) OVER w, 0) * 0.0078125
            + COALESCE(LAG(v, 7) OVER w, 0) * 0.00390625) / 100.0
             AS ewma_value
    FROM c
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


def _ewma_lag_expr(v, w):
    """The depth-8 dyadic lag combination, left-to-right — one
    definition so the plain and segmented operators cannot drift in
    floating-point association order (the exactness argument in
    win_ewma's docstring depends on it)."""
    expr = v * F.lit(0.5)
    for k in range(1, 8):
        expr = expr + F.coalesce(F.lag(v, k).over(w), F.lit(0)) * F.lit(0.5 ** (k + 1))
    return expr


@register("win_ewma", oracle=_EWMA_ORACLE)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α = 1/2), truncated at
    depth 8 — the time-series smoothing every monitoring pipeline wants.
    The true EWMA recurrence is sequential (Spark window frames can't
    express y[i] = α·x[i] + (1-α)·y[i-1]); the depth-8 truncation is a
    fixed linear combination of lags, which IS expressible, embarrassingly
    parallel, and within 2⁻⁸ of the infinite recurrence.

    Exactness: weights are dyadic (2⁻¹ … 2⁻⁸), values are integer cents —
    every product and the left-to-right sum are exact in binary floating
    point, so both engines produce identical doubles with NO tolerance."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    expr = _ewma_lag_expr(cents("value"), w)
    return ev.select(
        "user_id", "event_id", (expr / 100.0).alias("ewma_value")
    )


# Keys with at least this many rows take the segmented path; everyone
# else keeps the plain single-shuffle window (whose partition size is
# then BOUNDED by this constant). Semantic no-op: both paths compute
# the identical dyadic arithmetic, so the threshold only moves cost.
_SEG_HOT_ROWS = 200_000


@register("win_ewma_segmented", oracle=_EWMA_ORACLE)
def win_ewma_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """win_ewma with a BOUNDED worst-case window partition: the
    skew-rung answer, in the measured hybrid form.

    win_ewma partitions its window by user_id alone, so a hot key's
    entire history becomes ONE sorted partition on one core — measured
    on the skew100x rung (SCALE.md round-7): a user holding 2M of 10M
    rows costs a 2.7× wall straggler with 31 cores idle, and the curve
    is linear in the hot key's size (a 100M-row key stalls the stage
    outright). Because the operator is the DEPTH-8 TRUNCATED EWMA, each
    output row depends on only its 7 predecessors, so a hot key's
    history never needs to be co-resident: rows of HOT keys (per-key
    row count >= _SEG_HOT_ROWS, from a map-side-combined count) are
    windowed over (user_id, hour-segment) with each segment's last <=7
    rows carried to the following segments; everyone else keeps the
    plain single-shuffle window, now bounded at _SEG_HOT_ROWS rows per
    partition. The hot-key list is tiny by construction (<= n_rows /
    threshold keys) and broadcasts to split the stream without a
    shuffle.

    WHY HYBRID, not segment-everything: the first (segment-all) form
    was measured 3.5× SLOWER than the straggler it removed (20.8 s vs
    6.0 s at skew100x, 3.9 G shuffle, 3.6 G spill) — for the ~150k
    SPARSE keys (~53 rows spread over 720 hours) nearly every row is
    the last of its segment, so the "bounded" last-7 tail stream was
    the whole table and the ×7 carry fan-out amplified it further.
    Segmentation only pays on keys dense enough to have many rows per
    segment — exactly the keys the threshold selects. (SCALE.md
    round-7 carries both measurements.)

    Carry sufficiency on the hot path: the 7 global predecessors of any
    segment's rows span at most the 7 previous NON-EMPTY segments (each
    contributes min(count, 7) >= 1 tail rows), so candidates = tails
    fanned to the next 7 segment INDICES (dense per-user rank of
    non-empty segments — sparse/empty hours cannot starve the
    lookback), re-ranked per destination to the true last 7. Carry rows
    are flagged, used only as lag context, and dropped from the output.
    Same result to the last bit on both paths: identical dyadic
    arithmetic via _ewma_lag_expr, hence the SAME oracle text as
    win_ewma."""
    ev = table(spark, sf_dir, "events")
    return _ewma_hybrid(ev, hot_rows=_SEG_HOT_ROWS)


# ---- Bounded-lookback segmented windows (generic combinator) ----------
#
# ANY window whose frame reaches back at most k rows (lags up to k, a
# ROWS BETWEEN -k AND CURRENT ROW frame, ...) admits the same hot-key
# rewrite: segment the key's stream by a coarse ordering bucket, carry
# each segment's last <=k rows into the following segments as context,
# window within (key, segment), drop the carry rows. win_ewma_segmented
# (k=7) and win_rolling_median_segmented (k=4) are instantiations; the
# machinery, its carry-sufficiency argument, and the hybrid hot/cold
# split live here once.


def _hybrid_lookback(
    ev: DataFrame,
    lookback: int,
    mk_expr,
    out_name: str,
    hot_rows: int,
    seg_seconds: int = 3600,
) -> DataFrame:
    """Split by per-key row count: segmented windows for keys with
    >= hot_rows rows, the plain (now threshold-bounded) window for the
    rest. mk_expr(window_spec) -> Column computes the operator's value
    over rows (user_id, event_id, ts, v=cents) — the SAME callable
    feeds both paths, so they cannot diverge. hot_rows is a parameter
    so tests can force both paths on small frames."""
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_rows"))
    hot = counts.filter(F.col("n_rows") >= hot_rows).select("user_id")
    # No forced broadcast on the hot list (advice r7): its size bound is
    # n_rows/hot_rows KEYS — at the 100 TB scale this operator targets
    # (~10^12 rows) that is ~10^7-10^8 keys, past broadcastable, so a
    # mandatory hint would fail exactly in the regime the hybrid exists
    # for. AQE measures the list at runtime and broadcasts it when (and
    # only when) it is actually small; otherwise both sides already
    # shuffle on user_id, which the downstream window reuses.
    cold = ev.join(hot, "user_id", "left_anti")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    plain = cold.select(
        "user_id", "event_id", "ts", cents("value").alias("v")
    ).select("user_id", "event_id", mk_expr(w).alias(out_name))
    segd = _segmented_lookback(
        ev.join(hot, "user_id"),
        lookback,
        mk_expr,
        out_name,
        seg_seconds=seg_seconds,
    )
    return plain.unionByName(segd)


def _segmented_lookback(
    ev: DataFrame,
    lookback: int,
    mk_expr,
    out_name: str,
    seg_seconds: int = 3600,
) -> DataFrame:
    """Segment-and-carry core (see win_ewma_segmented's docstring for
    the design and measurements). Carry sufficiency for any lookback k:
    the k global predecessors of a segment's rows span at most the k
    previous NON-EMPTY segments (each contributes min(count, k) >= 1
    tail rows), so fanning tails to the next k segment INDICES and
    re-ranking to the true last k per destination restores exactly the
    frame content the plain window would have seen."""
    k = lookback
    base = ev.select(
        "user_id",
        "event_id",
        "ts",
        cents("value").alias("v"),
        F.floor(F.unix_timestamp("ts") / F.lit(seg_seconds)).alias("seg"),
    )
    # dense index of each user's NON-EMPTY segments: one row per
    # (user, seg) after a map-side-combining distinct, so this window's
    # partitions are bounded by span/seg_seconds, not by row volume
    segs = base.select("user_id", "seg").distinct()
    w_idx = Window.partitionBy("user_id").orderBy("seg")
    segs = segs.withColumn("idx", F.row_number().over(w_idx))
    # each segment's last <=k rows (within-segment window: bounded)
    w_tail = Window.partitionBy("user_id", "seg").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    tails = (
        base.withColumn("r", F.row_number().over(w_tail))
        .filter(F.col("r") <= k)
        .drop("r")
        .join(segs, ["user_id", "seg"])
    )
    # fan tails to the next k non-empty segment indices, keep only
    # indices that exist, re-rank to the true last k per destination
    dests = segs.select(
        "user_id", F.col("seg").alias("d_seg"), F.col("idx").alias("d_idx")
    )
    cand = (
        tails.withColumn(
            "d_idx", F.explode(F.sequence(F.col("idx") + 1, F.col("idx") + k))
        )
        .drop("seg", "idx")
        .join(dests, ["user_id", "d_idx"])
    )
    w_pick = Window.partitionBy("user_id", "d_seg").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    carry = (
        cand.withColumn("r", F.row_number().over(w_pick))
        .filter(F.col("r") <= k)
        .select(
            "user_id",
            "event_id",
            "ts",
            "v",
            F.col("d_seg").alias("seg"),
            F.lit(1).alias("is_carry"),
        )
    )
    un = base.withColumn("is_carry", F.lit(0)).unionByName(carry)
    # segment-bounded window; carry rows sort strictly before genuine
    # rows (seg is monotone in ts at second granularity, and ordering
    # ties break on the unique event_id)
    w = Window.partitionBy("user_id", "seg").orderBy("ts", "event_id")
    return (
        un.withColumn(out_name, mk_expr(w))
        .filter(F.col("is_carry") == 0)
        .select("user_id", "event_id", out_name)
    )


def _ewma_expr(w) -> "F.Column":
    """win_ewma's value as a function of the (ordered) window spec —
    the mk_expr instantiation both EWMA forms share."""
    return _ewma_lag_expr(F.col("v"), w) / 100.0


def _ewma_hybrid(
    ev: DataFrame, hot_rows: int, seg_seconds: int = 3600
) -> DataFrame:
    """win_ewma_segmented's core: the k=7 instantiation."""
    return _hybrid_lookback(
        ev, 7, _ewma_expr, "ewma_value", hot_rows, seg_seconds
    )


def _ewma_segmented(ev: DataFrame, seg_seconds: int = 3600) -> DataFrame:
    """Segment-everything EWMA — kept for tests that exercise the carry
    machinery directly (the registered operator is the hybrid)."""
    return _segmented_lookback(ev, 7, _ewma_expr, "ewma_value", seg_seconds)


# Shared by win_rolling_median and win_rolling_median_segmented (same
# single-oracle posture as _EWMA_ORACLE)
_ROLLING_MEDIAN_ORACLE = """
    WITH c AS (
      SELECT user_id, event_id, ts,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
      FROM events
    ),
    fr AS (
      SELECT user_id, event_id,
             list_sort(list(v) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
               AS vs
      FROM c
    )
    SELECT user_id, event_id,
           CASE WHEN len(vs) % 2 = 1
                THEN CAST(vs[(len(vs) + 1) // 2] AS DOUBLE) / 100.0
                ELSE CAST(vs[len(vs) // 2] + vs[len(vs) // 2 + 1] AS DOUBLE)
                     / 200.0 END AS rolling_median
    FROM fr
    """


def _rolling_median_expr(w) -> "F.Column":
    """Median of the last-5-rows frame over cents column v, as a
    function of the (ordered) window spec — one definition for the
    plain and segmented forms (k=4 lookback: 4 PRECEDING + CURRENT)."""
    vs = F.array_sort(F.collect_list(F.col("v")).over(w.rowsBetween(-4, 0)))
    n = F.size(vs)
    odd = F.element_at(vs, ((n + 1) / 2).cast("int")).cast("double") / 100.0
    even = (
        (
            F.element_at(vs, (n / 2).cast("int"))
            + F.element_at(vs, (n / 2).cast("int") + 1)
        ).cast("double")
        / 200.0
    )
    return F.when(n % 2 == 1, odd).otherwise(even)


@register("win_rolling_median", oracle=_ROLLING_MEDIAN_ORACLE)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median of the last 5 values per user — the robust
    (outlier-proof) twin of win_sliding_rows' moving average. Spark
    forbids median() with a window frame, so the operator materializes
    the frame with collect_list, sorts the (≤5-element) array, and picks
    the middle — O(k log k) per row for constant k, a standard rewrite.
    Values ride as integer cents; odd frames divide by 100, even frames
    average two cents values exactly, so both engines emit identical
    doubles."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id", "ts", cents("value").alias("v")
    ).select(
        "user_id",
        "event_id",
        _rolling_median_expr(w).alias("rolling_median"),
    )


@register("win_rolling_median_segmented", oracle=_ROLLING_MEDIAN_ORACLE)
def win_rolling_median_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """win_rolling_median under hot-key skew: the k=4 instantiation of
    the bounded-lookback hybrid (see win_ewma_segmented for the design,
    the measured segment-all failure, and the crossover numbers — this
    operator exists because the combinator generalizes: ANY frame
    reaching back at most k rows gets the same rewrite, and the rolling
    median's 4-PRECEDING frame is the second proof point). Same bits as
    win_rolling_median via the shared _rolling_median_expr, hence the
    same oracle text."""
    ev = table(spark, sf_dir, "events")
    return _hybrid_lookback(
        ev, 4, _rolling_median_expr, "rolling_median", _SEG_HOT_ROWS
    )


@register(
    "win_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(day(ts) AS BIGINT) AS d FROM events
    ),
    grp AS (
      SELECT user_id, d,
             d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS g
      FROM days
    ),
    islands AS (
      SELECT user_id, MIN(d) AS streak_start, MAX(d) AS streak_end,
             COUNT(*) AS streak_days
      FROM grp GROUP BY user_id, g
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(streak_days) AS BIGINT) AS longest_streak,
           CAST(MIN(streak_start) AS BIGINT) AS first_day,
           CAST(MAX(streak_end) AS BIGINT) AS last_day
    FROM islands GROUP BY user_id
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-activity streaks via the
    classic `value − row_number()` grouping trick — consecutive days
    share the same difference, so one window + one aggregate finds
    every island without self-joins or recursion. The canonical
    engagement-streak / session-boundary analysis.

    Scale: window and both aggregates all partition by user_id — a
    single key-aligned shuffle; per-key data is distinct active DAYS
    (bounded, tiny) regardless of event volume."""
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.dayofmonth("ts").cast("long").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn("g", F.col("d") - F.row_number().over(w))
    islands = grp.groupBy("user_id", "g").agg(
        F.min("d").alias("streak_start"),
        F.max("d").alias("streak_end"),
        F.count(F.lit(1)).alias("streak_days"),
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.max("streak_days").cast("bigint").alias("longest_streak"),
        F.min("streak_start").cast("bigint").alias("first_day"),
        F.max("streak_end").cast("bigint").alias("last_day"),
    )
