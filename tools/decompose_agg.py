"""Floor-vs-work decomposition for the last two undecomposed >2×-at-sf10
bench rows (r8 verdict item 4): `distinct_users` (agg_distinct) and
`events_tumbling_1h` (the bench batch tumbling shape). Both are
two-stage partial-aggregate plans whose sf10 wall is a few hundred ms;
the question is how much is WORK (scan, partial agg, exchange, final)
vs per-stage scheduling floor, and whether forcing the near-empty
reduce side to ONE partition (the output cardinality is 5 / ~17k rows)
buys anything.

Method, same discipline as BASELINE.md's knn plan study:
- fresh plan per iteration, median of N (wall);
- the same session's trivial-query floor (spark.range(10).toPandas());
- per-stage executor time + shuffle bytes from the local Spark UI REST
  API (localhost only — no external traffic), mapping stage 0 to
  scan+partial and stage 1+ to exchange-read+final;
- variants: scan-only (noop-style count over the pruned columns),
  shuffle.partitions=1 (single reduce task), and partitions=32
  (the bench default).

Usage: python tools/decompose_agg.py [sf_dir]   # default /tmp/sparkflow_sf10
"""

from __future__ import annotations

import json
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from sparkflow.catalog import table  # noqa: E402
from sparkflow.oracle_compat import cents  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkflow_sf10"
RUNS = 5


def q_distinct(spark, sf):
    return (
        table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"),
             F.count(F.lit(1)).alias("n_events"))
    )


def q_tumbling(spark, sf):
    ev = table(spark, sf, "events")
    return ev.groupBy(
        F.expr(
            "timestamp_micros(((unix_micros(ts) div 1000000) div 3600)"
            " * 3600 * 1000000)"
        ).alias("hour_start"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n_events"),
          (F.sum(cents("value")).cast("double") / 100.0).alias("value_sum"))


def median_wall(fn, n=RUNS):
    walls = []
    for _ in range(n):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return statistics.median(walls)


def stage_breakdown(spark, mk_df):
    """Run once, then read this job's per-stage executor metrics from
    the local UI REST endpoint."""
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app = sc.applicationId
    before = {
        s["stageId"]
        for s in json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages"))
    }
    mk_df().toPandas()
    stages = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"))
    new = sorted(
        (s for s in stages if s["stageId"] not in before),
        key=lambda s: s["stageId"],
    )
    return [
        {
            "stage": s["stageId"],
            "tasks": s["numCompleteTasks"],
            "executor_run_ms": s["executorRunTime"],
            "shuffle_write_mb": round(s["shuffleWriteBytes"] / 1e6, 2),
            "shuffle_read_mb": round(s["shuffleReadBytes"] / 1e6, 2),
            "input_mb": round(s["inputBytes"] / 1e6, 2),
        }
        for s in new
    ]


def main():
    from pyspark.sql import SparkSession

    # own builder, NOT sparkflow.session.get_spark: the per-stage REST
    # readout needs the (normally disabled) local UI; every other knob
    # matches the bench session (local[32], AQE, 32 shuffle partitions)
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("decompose")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf_dir": SF}

    # same-session trivial floor
    for _ in range(3):
        spark.range(10).toPandas()
    out["floor_ms"] = round(
        median_wall(lambda: spark.range(10).toPandas()) * 1000, 1)

    for name, mk in (("distinct_users", q_distinct),
                     ("events_tumbling_1h", q_tumbling)):
        row = {}
        row["wall_ms_p32"] = round(
            median_wall(lambda: mk(spark, SF).toPandas()) * 1000, 1)
        # scan-only: pruned columns, no agg/exchange (count is one
        # near-free partial per partition; input bytes dominate)
        cols = (["event_type", "user_id"] if name == "distinct_users"
                else ["ts", "event_type", "value"])
        row["scan_only_ms"] = round(median_wall(
            lambda: table(spark, SF, "events").select(*cols)
            .write.format("noop").mode("overwrite").save()) * 1000, 1)
        row["stages_p32"] = stage_breakdown(spark, lambda: mk(spark, SF))
        # one-reduce-task variant: output cardinality is tiny
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        try:
            row["wall_ms_p1"] = round(
                median_wall(lambda: mk(spark, SF).toPandas()) * 1000, 1)
            row["stages_p1"] = stage_breakdown(spark, lambda: mk(spark, SF))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        out[name] = row

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
