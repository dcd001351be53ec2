"""sf10 A/B for the two round-8 posture operators (VERDICT r7 items 3+4).

Measures, in ONE window with DuckDB interleaved (same-window discipline —
BASELINE.md round-5: only same-window A/B is meaningful on this box):

1. STAR JOIN: join_multiway_star (shuffle fact⋈fact) vs
   join_multiway_star_bucketed (co-located SMJ over bucketBy(8, orderkey)
   buckets, every dim broadcast, ≤1 exchange). The one-time bucketing
   write is timed separately — that is the cost the posture amortizes
   across every subsequent query on the bucket family.

2. JSON: fn_json (re-parse events.props per query) vs
   maintenance_json_materialize's read side (the same aggregate over the
   typed materialized copy). The one-time materialize pass is timed
   separately, same amortization story.

Methodology matches tools/bench_sf1.py: fresh DataFrame build per
iteration (fresh shuffle ids -> genuine full executions, no shuffle-stage
reuse), median of N, DuckDB runs its registered-oracle SQL interleaved in
the same loop. Results land in SCALE.md.

Usage:
  python tools/scale_smoke.py gen 100 /tmp/sparkflow_sf10   # once
  python tools/bench_posture.py [dir]                       # default sf10
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import sparkflow
from sparkflow.session import get_spark

DIR = "/tmp/sparkflow_sf10"
_RUNS = 5


def main() -> None:
    d = sys.argv[1] if len(sys.argv) > 1 else DIR
    if not os.path.isdir(d):
        raise SystemExit(f"{d} missing — run: python tools/scale_smoke.py gen 100 {d}")
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    spark = get_spark("bench-posture", shuffle_partitions=32)
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in sparkflow.catalog.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    q = sparkflow.QUERIES
    out: dict = {"dir": d, "runs": _RUNS}

    # ---- star join posture -------------------------------------------------
    t0 = time.perf_counter()
    from sparkflow.operators.joins import _bucketed_table

    # n_buckets must match the operator's (32): the default-8 family is a
    # DIFFERENT registered table and its write would be timed for nothing
    _bucketed_table(spark, d, "orders", "o_orderkey", n_buckets=32).count()
    _bucketed_table(spark, d, "lineitem", "l_orderkey", n_buckets=32).count()
    out["star_bucket_write_sec"] = round(time.perf_counter() - t0, 3)

    # PER-ITERATION interleaving (shuffle, bucketed, DuckDB round-robin):
    # block-sequential timing let a mid-run co-tenant burst hit one
    # variant only and flip the A/B (observed: two same-day windows
    # disagreed 0.51x vs 1.34x on the identical pair of plans)
    t0 = time.perf_counter()
    q["join_multiway_star_denorm"](spark, d).toPandas()  # stages enriched copy
    out["star_denorm_write_sec"] = round(time.perf_counter() - t0, 3)
    q["join_multiway_star"](spark, d).toPandas()  # warm
    q["join_multiway_star_bucketed"](spark, d).toPandas()
    star_sql = sparkflow.ORACLES["join_multiway_star"]
    con.execute(star_sql).fetchdf()
    t_sh, t_bk, t_dn, t_dk = [], [], [], []
    for _ in range(_RUNS):
        t0 = time.perf_counter()
        q["join_multiway_star"](spark, d).toPandas()
        t_sh.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        q["join_multiway_star_bucketed"](spark, d).toPandas()
        t_bk.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        q["join_multiway_star_denorm"](spark, d).toPandas()
        t_dn.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        con.execute(star_sql).fetchdf()
        t_dk.append(time.perf_counter() - t0)
    out["star_shuffle_sec"] = round(statistics.median(t_sh), 3)
    out["star_bucketed_sec"] = round(statistics.median(t_bk), 3)
    out["star_denorm_sec"] = round(statistics.median(t_dn), 3)
    out["star_duckdb_sec"] = round(statistics.median(t_dk), 3)

    # ---- JSON posture (same interleaving) ----------------------------------
    # one-time materialize pass (the operator stages on first call)
    t0 = time.perf_counter()
    q["maintenance_json_materialize"](spark, d).toPandas()
    out["json_materialize_write_sec"] = round(time.perf_counter() - t0, 3)
    q["fn_json"](spark, d).toPandas()  # warm
    json_sql = sparkflow.ORACLES["fn_json"]
    con.execute(json_sql).fetchdf()
    t_rp, t_mt, t_dk = [], [], []
    for _ in range(_RUNS):
        t0 = time.perf_counter()
        q["fn_json"](spark, d).toPandas()
        t_rp.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        q["maintenance_json_materialize"](spark, d).toPandas()
        t_mt.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        con.execute(json_sql).fetchdf()
        t_dk.append(time.perf_counter() - t0)
    out["json_reparse_sec"] = round(statistics.median(t_rp), 3)
    out["json_materialized_sec"] = round(statistics.median(t_mt), 3)
    out["json_duckdb_sec"] = round(statistics.median(t_dk), 3)

    # ---- pre-aggregation rollup postures ------------------------------------
    # The remaining DuckDB-wins-at-sf10 headline queries (q1,
    # distinct_users, events_tumbling) are all small-output scans whose
    # gap is pure scan+exchange cost. The engine answer is the same as
    # the JSON one: pay the scan ONCE into a maintained rollup, then
    # serve every subsequent query from the reduced table. Partials are
    # monoids (count/sum as exact cents/1e-4 units), so read-side
    # re-aggregation is bit-identical to the full recompute — asserted
    # below, not assumed. Day grain for q1 because its shipdate filter
    # lands on whole-day cells; hour+type grain for tumbling (= query
    # grain); a distinct-projection MV for the non-monoid distinct.
    import pandas as pd
    from pyspark.sql import functions as F

    from sparkflow.catalog import table as cat_table
    from sparkflow.oracle_compat import cents
    from sparkflow.operators.aggregates import _charge_units, _disc_price_units

    base = os.path.join("/tmp", "sparkflow_rollup", os.path.basename(d))

    def _norm(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return (
            pdf.reindex(sorted(pdf.columns), axis=1)
            .sort_values(sorted(pdf.columns))
            .reset_index(drop=True)
        )

    # one-time staged writes (the amortized cost)
    t0 = time.perf_counter()
    li = cat_table(spark, d, "lineitem")
    (
        li.groupBy("l_returnflag", "l_linestatus", F.to_date("l_shipdate").alias("day"))
        .agg(
            F.sum(cents("l_quantity")).alias("qty_c"),
            F.sum(cents("l_extendedprice")).alias("base_c"),
            F.sum(_disc_price_units()).alias("disc_price_u"),
            F.sum(_charge_units()).alias("charge_u"),
            F.sum(cents("l_discount")).alias("disc_c"),
            F.count(F.lit(1)).alias("n"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(base, "q1_partials"))
    )
    ev = cat_table(spark, d, "events")
    (
        ev.groupBy(
            F.expr(
                "timestamp_micros(((unix_micros(ts) div 1000000) div 3600)"
                " * 3600 * 1000000)"
            ).alias("hour_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents("value")).alias("val_c"))
        .write.mode("overwrite")
        .parquet(os.path.join(base, "hourly_partials"))
    )
    (
        ev.select("event_type", "user_id")
        .distinct()
        .write.mode("overwrite")
        .parquet(os.path.join(base, "distinct_mv"))
    )
    out["rollup_write_sec"] = round(time.perf_counter() - t0, 3)

    def q1_rollup():
        p = spark.read.parquet(os.path.join(base, "q1_partials")).filter(
            F.col("day") <= F.lit("2000-12-01").cast("date")
        )
        return p.groupBy("l_returnflag", "l_linestatus").agg(
            (F.sum("qty_c").cast("double") / 100.0).alias("sum_qty"),
            (F.sum("base_c").cast("double") / 100.0).alias("sum_base_price"),
            (F.sum("disc_price_u").cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum("charge_u").cast("double") / 1000000.0).alias("sum_charge"),
            ((F.sum("qty_c").cast("double") / 100.0) / F.sum("n")).alias("avg_qty"),
            ((F.sum("base_c").cast("double") / 100.0) / F.sum("n")).alias("avg_price"),
            ((F.sum("disc_c").cast("double") / 100.0) / F.sum("n")).alias("avg_disc"),
            F.sum("n").alias("count_order"),
        )

    def tumbling_rollup():
        p = spark.read.parquet(os.path.join(base, "hourly_partials"))
        return p.select(
            "hour_start",
            "event_type",
            F.col("n").alias("n_events"),
            (F.col("val_c").cast("double") / 100.0).alias("value_sum"),
        )

    def distinct_rollup():
        # n_users from the distinct-projection MV; n_events re-uses the
        # hourly partials (one rollup family serving two queries)
        p = spark.read.parquet(os.path.join(base, "distinct_mv"))
        users = p.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
        n = (
            spark.read.parquet(os.path.join(base, "hourly_partials"))
            .groupBy("event_type")
            .agg(F.sum("n").alias("n_events"))
        )
        return users.join(F.broadcast(n), "event_type").select(
            "event_type", "n_users", "n_events"
        )

    from bench import BENCH_QUERIES  # noqa: E402  (repo root on sys.path)

    pairs = {
        "q1": (BENCH_QUERIES["q1_pricing_summary"], q1_rollup, "agg_hash_group"),
        "tumbling": (BENCH_QUERIES["events_tumbling_1h"], tumbling_rollup, None),
        "distinct": (BENCH_QUERIES["distinct_users"], distinct_rollup, "agg_distinct"),
    }
    for name, (raw_fn, roll_fn, okey) in pairs.items():
        # bit-equality: the rollup read must reproduce the raw query
        a, b = _norm(raw_fn(spark, d).toPandas()), _norm(roll_fn().toPandas())
        assert a.columns.tolist() == b.columns.tolist() and a.equals(b), (
            f"rollup mismatch for {name}"
        )
        t_raw, t_roll, t_dk = [], [], []
        sql = sparkflow.ORACLES.get(okey) if okey else None
        for _ in range(_RUNS):
            t0 = time.perf_counter()
            raw_fn(spark, d).toPandas()
            t_raw.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            roll_fn().toPandas()
            t_roll.append(time.perf_counter() - t0)
            if sql:
                t0 = time.perf_counter()
                con.execute(sql).fetchdf()
                t_dk.append(time.perf_counter() - t0)
        out[f"{name}_raw_sec"] = round(statistics.median(t_raw), 3)
        out[f"{name}_rollup_sec"] = round(statistics.median(t_roll), 3)
        if t_dk:
            out[f"{name}_duckdb_sec"] = round(statistics.median(t_dk), 3)

    # ---- q3 on the SAME orderkey bucket family ------------------------------
    # The star posture's whole economic argument is that the one-time
    # bucket write amortizes across every query touching the fact pair.
    # Prove it: TPC-H Q3 (the other perf-weak join headline) served from
    # the IDENTICAL 32-bucket family staged above — zero marginal write.
    # The filtered customer edge is broadcast (explicit hint: ~300k rows
    # after the segment filter — past AQE's 10MB conservatism but far
    # under executor memory), so the bucketed orders stream reaches the
    # co-bucketed lineitem SMJ without ANY exchange; the only shuffle
    # left is the final tiny agg.
    from sparkflow.oracle_compat import rev_sum

    def q3_bucketed():
        c = cat_table(spark, d, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        o = _bucketed_table(spark, d, "orders", "o_orderkey", n_buckets=32)
        li = _bucketed_table(spark, d, "lineitem", "l_orderkey", n_buckets=32)
        return (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(li.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderkey", "o_orderdate")
            .agg(rev_sum("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
            .limit(10)
        )

    raw_q3 = sparkflow.QUERIES["limit_topk"]
    a, b = _norm(raw_q3(spark, d).toPandas()), _norm(q3_bucketed().toPandas())
    assert a.columns.tolist() == b.columns.tolist() and a.equals(b), (
        "q3 bucketed variant mismatch"
    )
    q3_sql = sparkflow.ORACLES["limit_topk"]
    t_raw, t_bk, t_dk = [], [], []
    for _ in range(_RUNS):
        t0 = time.perf_counter()
        raw_q3(spark, d).toPandas()
        t_raw.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        q3_bucketed().toPandas()
        t_bk.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        con.execute(q3_sql).fetchdf()
        t_dk.append(time.perf_counter() - t0)
    out["q3_raw_sec"] = round(statistics.median(t_raw), 3)
    out["q3_bucketed_sec"] = round(statistics.median(t_bk), 3)
    out["q3_duckdb_sec"] = round(statistics.median(t_dk), 3)

    print(json.dumps(out))
    print(
        f"\nstar:  shuffle {out['star_shuffle_sec']}s  bucketed "
        f"{out['star_bucketed_sec']}s  duckdb {out['star_duckdb_sec']}s  "
        f"(one-time bucket write {out['star_bucket_write_sec']}s)"
    )
    print(
        f"json:  re-parse {out['json_reparse_sec']}s  materialized "
        f"{out['json_materialized_sec']}s  duckdb {out['json_duckdb_sec']}s  "
        f"(one-time materialize {out['json_materialize_write_sec']}s)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
