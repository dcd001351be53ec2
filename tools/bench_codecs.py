"""Ingest-codec throughput study: what do the pure-Python format
codecs (avrolite, protolite) cost per core, and how fast does the same
data come back off parquet — i.e. how quickly does convert-once-to-
parquet pay for itself?

Two levels, both warm medians of N runs:
1. single-core decode micro-bench (no Spark): encode the orders 4-col
   subset once, then time decode only — MB/s of wire bytes, rows/s.
2. end-to-end Spark A/B at the same sf: scan_protobuf / scan_avro
   count() (staged, so sink cost excluded) vs spark.read.parquet
   count() of the same columns.

Usage: python tools/bench_codecs.py [sf_dir] [runs]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import duckdb

    from sparkflow.sources import avrolite, protolite
    from sparkflow.sources.io import _PB_FIELDS as pb_fields  # shipped spec

    col_list = ", ".join(name for _, name, _ in pb_fields)
    rows = duckdb.sql(
        f"SELECT {col_list} FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchall()
    n = len(rows)
    print(f"rows: {n}  (sf_dir={sf_dir}, runs={runs}, warm medians)")
    av_schema = {
        "type": "record", "name": "orders",
        "fields": [
            {"name": "o_orderkey", "type": "long"},
            {"name": "o_custkey", "type": "long"},
            {"name": "o_orderpriority", "type": "string"},
            {"name": "o_totalprice", "type": "double"},
        ],
    }

    def med(fn):
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    pb = protolite.write_delimited(pb_fields, rows)
    av_null = avrolite.write_container(av_schema, rows, codec="null")
    av_defl = avrolite.write_container(av_schema, rows, codec="deflate")

    for name, blob, dec in [
        ("protolite (delimited)", pb,
         lambda: protolite.read_delimited(pb_fields, pb)),
        ("avrolite (null)", av_null,
         lambda: avrolite.read_container(av_null)),
        ("avrolite (deflate)", av_defl,
         lambda: avrolite.read_container(av_defl)),
    ]:
        t = med(dec)
        print(f"{name:24s} {len(blob)/1e6:7.2f} MB wire  decode {t:6.3f} s"
              f"  = {len(blob)/1e6/t:6.1f} MB/s  {n/t/1e3:7.1f} krows/s"
              " (1 core)")

    # level 2: end-to-end Spark
    from pyspark.sql import functions as F  # noqa: F401

    import sparkflow
    from sparkflow.session import get_spark

    spark = get_spark("bench-codecs", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    q = sparkflow.QUERIES
    for key in ("scan_protobuf", "scan_avro"):
        q[key](spark, sf_dir).count()  # stage once (sink excluded)
        t = med(lambda k=key: q[k](spark, sf_dir).count())
        print(f"{key:24s} end-to-end count() {t:6.3f} s (8 files, 32 cores)")
    cols = ["o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"]
    pq = lambda: spark.read.parquet(f"{sf_dir}/orders.parquet")\
        .select(*cols).count()  # noqa: E731
    pq()
    print(f"{'parquet scan':24s} end-to-end count() {med(pq):6.3f} s")
    spark.stop()


if __name__ == "__main__":
    main()
