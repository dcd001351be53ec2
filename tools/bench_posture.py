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
