"""Measured AQE skew-join evidence at the 10x scale point (round-5
verdict item 8: turn the pinned-config plan test into numbers).

Builds a deliberately hot-keyed join over the 10x events replica
(~1 M rows/replica x 10): half of all rows collapse onto one join key,
the other half stay unique-ish — the classic power-law hot key. The
same sort-merge join runs twice, AQE skew split OFF then ON, against
a right side big enough that broadcast is not an option (which is
otherwise always the first fix for a skewed dim join). Reported per
run:

- wall time,
- the join-stage task count (splits add tasks),
- the join-stage max/median task duration from the REST taskSummary —
  the straggler effect is THE symptom skew split exists to remove,
- the executed-plan skew markers (skew=true / skewed reader).

Usage: python tools/skew_demo.py   (needs /tmp/sparkflow_scale10x —
run `python tools/scale_smoke.py gen` first)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/tmp/sparkflow_scale10x"
PORT = 4041


def _api(path: str):
    with urllib.request.urlopen(
        f"http://localhost:{PORT}/api/v1{path}", timeout=10
    ) as resp:
        return json.load(resp)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import sparkflow  # noqa: F401
    from sparkflow.catalog import table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("skew-demo")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(PORT))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # both sides must stay big: broadcast would sidestep the skew
        # (and IS the right first answer when one side is small)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        # thresholds sized to the 10x volume: the hot partition carries
        # ~900k rows (~7MB lz4-compressed — the SKEW TEST RUNS ON
        # COMPRESSED BYTES, the second documented precondition); split
        # it toward 1MB targets
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2MB"
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app = _api("/applications")[0]["id"]

    ev = table(spark, SRC, "events")
    # hot key: ~90% of the 1M fact rows collapse onto key 0, the rest
    # keep their user key — the power-law shape that actually trips the
    # skew detector (a 50%-hot variant measured under the radar here:
    # the hot partition has to dwarf the MEDIAN partition by the
    # configured factor AND clear the byte threshold)
    hot = F.when(F.col("user_id") % 10 > 0, F.lit(0)).otherwise(F.col("user_id"))
    # AQE skew splits are MAPPER-GRANULAR (documented precondition in
    # SCALE.md + test_plans.py): the 10x events parquet is one compact
    # file -> one scan partition -> ONE mapper feeding the join
    # exchange, and a 1-mapper-wide skewed partition cannot be split.
    # The repartition gives the exchange 48 mappers to split along —
    # at real scale the scan has thousands of splits and this is free.
    left = ev.select(hot.alias("k"), "value", "event_id").repartition(48)
    # right side: a genuine DIM (one row per key, from an independent
    # source). Two rejected variants, both measured, both instructive:
    # a filtered slice of events is ~all hot-key rows (hot x hot
    # cartesian blowup — 10^10 output rows), and .distinct() over the
    # fact inserts a HashAggregate between the shuffle and the join,
    # which BREAKS OptimizeSkewedJoin's pattern (the SMJ must read its
    # children directly from shuffle stages; you cannot re-slice the
    # input of an aggregate).
    right = spark.range(2_000_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("rpay")
    )

    def join_df():
        return left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("rpay") + F.col("event_id") % 1000).alias("chk"),
        )

    def stages_snapshot():
        return {s["stageId"] for s in _api(f"/applications/{app}/stages")}

    def run(skew_on: bool):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        seen = stages_snapshot()
        df = join_df()
        t0 = time.perf_counter()
        row = df.collect()[0]
        wall = time.perf_counter() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        new_stages = [
            s
            for s in _api(f"/applications/{app}/stages")
            if s["stageId"] not in seen and s["status"] == "COMPLETE"
        ]
        # the stage where the straggler lives is the one with the
        # largest SINGLE task, not the largest total (the 48-task
        # repartition out-totals the join stage)
        best = None
        for st in new_stages:
            q = _api(
                f"/applications/{app}/stages/{st['stageId']}/"
                f"{st['attemptId']}/taskSummary?quantiles=0.5,1.0"
            )
            med, mx = q["executorRunTime"]
            if best is None or mx > best[2]:
                best = (st, med, mx)
        join_stage, med_ms, max_ms = best
        return {
            "wall": wall,
            "n": row["n"],
            "chk": row["chk"],
            "total_tasks": sum(s["numCompleteTasks"] for s in new_stages),
            "task_med_ms": med_ms,
            "task_max_ms": max_ms,
            "skew_markers": plan.count("skew=true"),
            "skewed_reader": "skewed" in plan,
        }

    off = run(False)
    on = run(True)
    assert off["n"] == on["n"] and off["chk"] == on["chk"], (
        "skew split changed the result!",
        off,
        on,
    )
    print(f"rows joined: {off['n']:,} (identical both runs, checksum match)")
    for tag, r in [("skew OFF", off), ("skew ON ", on)]:
        print(
            f"{tag}: wall {r['wall']:6.1f}s  tasks {r['total_tasks']:3d}  "
            f"straggler-stage med/max "
            f"{r['task_med_ms']/1000:.1f}s/{r['task_max_ms']/1000:.1f}s  "
            f"plan skew=true x{r['skew_markers']} skewed-reader={r['skewed_reader']}"
        )
    assert on["skew_markers"] > 0 and on["skewed_reader"], "skew split did not fire"
    assert not off["skew_markers"], "control run unexpectedly skew-split"
    print(
        f"wall {off['wall']:.1f}s -> {on['wall']:.1f}s; straggler max task "
        f"{off['task_max_ms']/1000:.1f}s -> {on['task_max_ms']/1000:.1f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
