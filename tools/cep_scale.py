"""CEP batch-compile scale rung (r16, r15 verdict item 6).

The 27 `stream_cep_*` keys carry sf0.01 oracles and brute-force fuzz
but had no SCALE.md rung. This measures the batch compile of four
representative pattern classes against the DuckDB oracle at the
ephemeral scale rungs (/tmp/sparkflow_sf{10,30} — regenerate with
`python tools/scale_shard_proof.py gen N <dst>`), in checksum mode
(count + sum of epoch_us(match_ts) — match sets grow with the corpus,
so neither engine pays a result-transfer bill):

- stream_cep_compile        — the plain carry-chain class (one sort)
- stream_cep_until          — gates + freeze riders
- stream_cep_midneg_gap     — count-gated bounded carries
- stream_cep_not_next_gap   — LEAD gate + bounded GREATEST carries
  (the skip key's recursive-acceptance ORACLE is quadratic per key in
  DuckDB and times out already at sf10 — the Spark side is linear; the
  gap twin exercises the same LEAD-gate machinery with a linear
  oracle)

The streaming twins' STATE evidence lives in
tests/test_streaming.py::test_cep_streaming_state_bounds (progress
metrics: interval-join rows horizon-bounded, keyed machines one state
row per key); this tool is the batch throughput half of the rung.

Usage: python tools/cep_scale.py [sf_dir ...]   (default sf10, sf30)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sparkflow  # noqa: E402
from sparkflow.session import get_spark  # noqa: E402

KEYS = [
    "stream_cep_compile",
    "stream_cep_until",
    "stream_cep_midneg_gap",
    "stream_cep_not_next_gap",
]
_RUNS = 3
_CK = ("SELECT COUNT(*) AS n, "
       "SUM(epoch_us(match_ts) % 1000000007) AS s1 "
       "FROM ({q})")


def main(rungs):
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    spark = get_spark("cep-scale", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = {"load_1m": os.getloadavg()[0], "rungs": {}}
    for sf_dir in rungs:
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet')"
        )
        rung = {}
        for key in KEYS:
            fn = sparkflow.QUERIES[key]
            sql = _CK.format(q=sparkflow.ORACLES[key])

            def spark_ck():
                return (
                    fn(spark, sf_dir)
                    .selectExpr("count(*) AS n",
                                "sum(unix_micros(match_ts) % 1000000007) AS s1")
                    .toPandas()
                )

            spark_ck()  # warm
            con.execute(sql).fetchdf()
            t_s, t_d, ck_s, ck_d = [], [], None, None
            for _ in range(_RUNS):
                t0 = time.perf_counter()
                d = con.execute(sql).fetchdf()
                ck_d = (int(d["n"][0]), int(d["s1"][0] or 0))
                t_d.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                s = spark_ck()
                ck_s = (int(s["n"][0]), int(s["s1"][0] or 0))
                t_s.append(time.perf_counter() - t0)
            assert ck_s == ck_d, (key, sf_dir, ck_s, ck_d)
            ms, md = statistics.median(t_s), statistics.median(t_d)
            rung[key] = {
                "spark_s": round(ms, 2), "duck_s": round(md, 2),
                "ratio": round(ms / md, 2), "rows": ck_s[0],
            }
            print(f"{sf_dir} {key}: spark {ms:6.2f}s  duck {md:6.2f}s "
                  f"ratio {ms / md:5.2f}x  ({ck_s[0]} matches)",
                  flush=True)
        out["rungs"][sf_dir] = rung
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:] or ["/tmp/sparkflow_sf10", "/tmp/sparkflow_sf30"])
