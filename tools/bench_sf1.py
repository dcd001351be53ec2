"""sf1 bench rung (round-5 verdict item 2, carried to r7).

At sf0.1 every headline query sits on the ~30 ms dispatch floor, so the
"within 2x of baseline" criterion measures the harness, not the plans.
This tool measures the same 8 headline queries at sf1 — the 10x replica
of sf0.1 (lineitem 6M rows, events 1M, built by tools/scale_smoke.py
with consistent key remaps) — Spark vs DuckDB, SAME WINDOW, interleaved
per iteration so machine-load drift hits both engines equally
(BASELINE.md round-5 load note; only same-window A/B is meaningful on
this box).

Methodology mirrors bench.py exactly on the Spark side (prepared plan
built once, warm-up run, median of 5 full re-executions fetched via
Arrow toPandas) and BASELINE.md on the DuckDB side (view over the same
parquet, prepared SQL string, warm-up, median of 5 fetchdf). The DuckDB
SQL is each query's REGISTERED ORACLE — the exact statements the
correctness harness hash-matches against, so the two engines provably
compute the same result while being timed.

Usage:
  python tools/scale_smoke.py gen      # once: build /tmp/sparkflow_scale10x
  python tools/bench_sf1.py            # run, print table + one JSON line
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
from bench import BENCH_QUERIES
from sparkflow.session import get_spark

SF1 = "/tmp/sparkflow_scale10x"

# bench query name -> registered oracle key (events_tumbling_batch in
# bench.py is the batch twin of stream_tumbling — identical shape)
_ORACLE_KEY = {
    "q1_pricing_summary": "agg_hash_group",
    "q3_join3_topk": "limit_topk",
    "q5_join5_agg": "join_multiway_star",
    "window_rank_orders": "win_topk_per_group",
    "distinct_users": "agg_distinct",
    "events_tumbling_1h": "stream_tumbling",
    "json_extract_agg": "fn_json",
    "embeddings_knn": "llm_knn_cosine",
}
_RUNS = 5


def main() -> None:
    if not os.path.isdir(SF1):
        raise SystemExit(f"{SF1} missing — run: python tools/scale_smoke.py gen")

    spark = get_spark("bench-sf1", shuffle_partitions=32)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in sparkflow.catalog.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF1}/{t}.parquet')"
        )

    from pyspark.sql import functions as F

    rows = []
    for name, fn in BENCH_QUERIES.items():
        sql = sparkflow.ORACLES[_ORACLE_KEY[name]]
        df = fn(spark, SF1)  # prepared plan, built once
        df.toPandas()  # warm
        con.execute(sql).fetchdf()  # warm
        t_spark, t_duck = [], []
        for _ in range(_RUNS):  # interleaved: same-window by construction
            t0 = time.perf_counter()
            n_duck = len(con.execute(sql).fetchdf())
            t_duck.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            n_spark = len(df.toPandas())
            t_spark.append(time.perf_counter() - t0)
        rows.append(
            (name, statistics.median(t_spark), statistics.median(t_duck),
             n_spark, n_duck)
        )

    # same-run dispatch floor (bench.py's definition)
    fdf = spark.range(10).select(F.col("id"))
    fdf.toPandas()
    floor_times = []
    for _ in range(_RUNS):
        t0 = time.perf_counter()
        fdf.toPandas()
        floor_times.append(time.perf_counter() - t0)
    floor = statistics.median(floor_times)

    print(f"{'query':22s} {'spark(s)':>9s} {'duck(s)':>9s} {'ratio':>6s} "
          f"{'floor%':>7s} rows")
    q_json, d_json = {}, {}
    for name, ts, td, ns, nd in rows:
        q_json[name] = round(ts, 4)
        d_json[name] = round(td, 4)
        print(f"{name:22s} {ts:9.3f} {td:9.3f} {ts / td:5.2f}x "
              f"{100 * floor / ts:6.1f}% {ns}/{nd}")
    tot_s = sum(r[1] for r in rows)
    tot_d = sum(r[2] for r in rows)
    print(f"{'suite':22s} {tot_s:9.3f} {tot_d:9.3f} {tot_s / tot_d:5.2f}x   "
          f"floor {floor * 1000:.1f} ms")
    print(json.dumps({
        "metric": "sf1 headline suite, same-window interleaved A/B, median-of-5 warm",
        "value": round(tot_s, 4),
        "unit": "sec",
        "queries": q_json,
        "duckdb": d_json,
        "ratio": round(tot_s / tot_d, 3),
        "dispatch_floor_sec": round(floor, 4),
        "sf": 1.0,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
