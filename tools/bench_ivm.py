"""IVM posture A/B (r11): raw scan vs staged-rollup read-through for
the three engine-floor aggregates — q1 (agg_hash_group), distinct_users
(agg_distinct), events_tumbling_1h (batch twin) — at the given SF, in
ONE session, DuckDB interleaved (same-window protocol, bench_sf1's).

Protocol: (1) raw medians first (fresh plan per iteration — the
read-through cannot engage because nothing is staged yet); (2) run the
three maintenance_rollup_* passes once, timing the staging cost the
posture amortizes; (3) read-through medians (fresh plan per iteration —
now resolves to the partials read); DuckDB's full recompute interleaved
throughout as the constant yardstick. Spark values are verified
identical raw-vs-staged in-session (the bit-identity the oracles pin).

Usage: python tools/bench_ivm.py [sf_dir]  (default /tmp/sparkflow_sf10)
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

_RUNS = 5
_QUERIES = {
    "q1_pricing_summary": ("agg_hash_group", "maintenance_rollup_pricing"),
    "distinct_users": ("agg_distinct", "maintenance_rollup_distinct"),
    "events_tumbling_1h": ("stream_tumbling", "maintenance_rollup_tumbling"),
    # r12: the flagship star vs its join-aggregate IVM posture
    # (maintenance_rollup_q5 — the r11 verdict item 4 closure)
    "q5_join5_agg": ("join_multiway_star", "maintenance_rollup_q5"),
    # r12 continuation: every remaining headline posture joins the A/B —
    # the maintained top-k, the JSON serve-frame ladder, the KNN matrix
    "q3_join3_topk": ("limit_topk", "maintenance_rollup_q3"),
    "json_extract_agg": ("fn_json", "maintenance_json_materialize"),
    "embeddings_knn": ("llm_knn_cosine", "maintenance_knn_quantize"),
}


def _clean_postures(sf_dir: str) -> None:
    """r12: staged postures are DURABLE (content-addressed) — a prior
    session's artifacts would make the 'raw' phase silently warm.
    Retract every posture this A/B exercises so phase 1 measures the
    genuine cold plans."""
    from sparkflow.sources import staging
    from sparkflow.sources.io import _ROLLUP_TABLES

    for name, tabs in _ROLLUP_TABLES.items():
        staging.unpublish("rollup", sf_dir, tabs, name)
        staging.unpublish("rollup", sf_dir, tabs, f"{name}_serve")
    for t, k in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        staging.unpublish("bucketed", sf_dir, (t,), f"{t}_{k}_b32")
    staging.unpublish("knn", sf_dir, ("embeddings",), "fxp_matrix")
    staging.unpublish("json_mat", sf_dir, ("events",), "events_k")
    staging.unpublish("json_mat", sf_dir, ("events",), "events_k_serve")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkflow_sf10"
    if not os.path.isdir(sf_dir):
        raise SystemExit(f"{sf_dir} missing — tools/scale_smoke.py gen")
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    spark = get_spark("bench-ivm", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    _clean_postures(sf_dir)
    con = duckdb.connect()
    for t in sparkflow.catalog.TABLES:
        # rung dirs carry only the tables these queries touch
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")

    def medians(fn, sql):
        t_s, t_d, vals = [], [], None
        fn(spark, sf_dir).toPandas()  # warm
        con.execute(sql).fetchdf()
        for _ in range(_RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchdf()
            t_d.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            vals = fn(spark, sf_dir).toPandas()  # fresh plan each time
            t_s.append(time.perf_counter() - t0)
        return statistics.median(t_s), statistics.median(t_d), vals

    out = {"sf_dir": sf_dir, "load_1m": os.getloadavg()[0], "rows": {}}
    raw = {}
    for name, (key, _) in _QUERIES.items():
        fn = BENCH_QUERIES[name]
        sql = sparkflow.ORACLES[key]
        ms, md, vals = medians(fn, sql)
        raw[name] = (ms, md, vals)
        print(f"RAW    {name:22s} spark {ms:6.3f}s  duck {md:6.3f}s  "
              f"ratio {ms / md:5.2f}x")

    t_stage = {}
    for name, (_, mkey) in _QUERIES.items():
        t0 = time.perf_counter()
        sparkflow.QUERIES[mkey](spark, sf_dir).toPandas()
        t_stage[name] = round(time.perf_counter() - t0, 3)
        print(f"STAGE  {name:22s} {t_stage[name]:6.3f}s  ({mkey})")

    for name, (key, _) in _QUERIES.items():
        fn = BENCH_QUERIES[name]
        sql = sparkflow.ORACLES[key]
        ms, md, vals = medians(fn, sql)
        ms_raw, _, vals_raw = raw[name]
        same = vals.sort_values(list(vals.columns)).reset_index(drop=True) \
            .equals(vals_raw.sort_values(list(vals_raw.columns))
                    .reset_index(drop=True))
        print(f"STAGED {name:22s} spark {ms:6.3f}s  duck {md:6.3f}s  "
              f"ratio {ms / md:5.2f}x  speedup {ms_raw / ms:5.2f}x  "
              f"identical={same}")
        out["rows"][name] = {
            "raw_spark_s": round(ms_raw, 3), "staged_spark_s": round(ms, 3),
            "duck_s": round(md, 3), "raw_ratio": round(ms_raw / md, 2),
            "staged_ratio": round(ms / md, 2), "stage_cost_s": t_stage[name],
            "identical": bool(same),
        }

    # phase 4 (r12): the INGEST-DELTA update — what a 100 TB deployment
    # pays per batch instead of the full stage cost above. Fixture setup
    # (materializing the landing-zone delta + yesterday's base partials)
    # is untimed: those are the ingest job's write and the previous
    # maintenance pass. The timed part is the delta-only merge plan —
    # partials over the 10% batch ⊎ KB-sized base partials (fact history
    # absent, pinned in tests/test_plans.py).
    from sparkflow.sources.io import _ingest_fixture, rollup_ingest_update

    rollup_of = {"q1_pricing_summary": "pricing",
                 "distinct_users": "distinct",
                 "events_tumbling_1h": "tumbling",
                 "q5_join5_agg": "q5",
                 "q3_join3_topk": "q3"}
    for bench_name, rname in rollup_of.items():
        _ingest_fixture(spark, sf_dir, rname)  # setup, untimed
        t0 = time.perf_counter()
        n = len(rollup_ingest_update(spark, sf_dir, rname).toPandas())
        dt = time.perf_counter() - t0
        row = out["rows"][bench_name]
        row["ingest_update_s"] = round(dt, 3)
        print(f"INGEST {bench_name:22s} update {dt:6.3f}s  "
              f"({n} merged partial rows; full stage "
              f"{row['stage_cost_s']:.1f}s)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
