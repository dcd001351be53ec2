"""Schema-drift tripwire for the driver-provided testdata.

Round 2 shipped a cross-cutting regression because `events.ts` silently
changed physical encoding between testdata generations (timestamp[ns] ->
timestamp[us], which Spark 4 reads as TIMESTAMP_NTZ) while the code
assumed the old type. This module re-reads the parquet FOOTERS (no Spark
session needed — pyarrow only, sub-second) and fails loudly, naming the
drifted column, so the next drift is a one-line diagnosis instead of 39
cascading failures.

The engine-side contract these types feed is `sparkflow.catalog`:
`normalize_ts` folds any of {int64 ns-as-long, TIMESTAMP_NTZ, TIMESTAMP}
to session-tz TIMESTAMP at the single load choke point. If `ts` shows up
here as a brand-new fourth encoding, BOTH this test and the catalog need
a look.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# column -> set of physical arrow types the engine knows how to load.
# events.ts is the drift-prone one; everything else is pinned exactly.
EXPECTED = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string", "large_string"}},
    "nation": {
        "n_nationkey": {"int32"},
        "n_name": {"string", "large_string"},
        "n_regionkey": {"int32"},
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_nationkey": {"int32"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string", "large_string"},
    },
    "supplier": {"s_suppkey": {"int64"}, "s_acctbal": {"double"}},
    "part": {"p_partkey": {"int64"}, "p_size": {"int32"}, "p_retailprice": {"double"}},
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[us]", "timestamp[ms]", "timestamp[ns]"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_shipdate": {"timestamp[us]", "timestamp[ms]", "timestamp[ns]"},
    },
    "events": {
        "event_id": {"int64"},
        # the encodings catalog.normalize_ts handles — a new one here
        # means the loader needs a new branch TOO, not just this set.
        "ts": {"timestamp[us]", "timestamp[ns]", "int64"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": {"int32"},
    },
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("tname", sorted(EXPECTED))
def test_parquet_footer_types_unchanged(sf_dir, tname):
    path = f"{sf_dir}/{tname}.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    schema = pq.read_schema(path)
    drift = []
    for col, allowed in EXPECTED[tname].items():
        assert col in schema.names, f"{tname}.{col} MISSING from {path}"
        actual = str(schema.field(col).type)
        if actual not in allowed:
            drift.append(f"{tname}.{col}: footer says {actual!r}, engine expects one of {sorted(allowed)}")
    assert not drift, (
        "TESTDATA SCHEMA DRIFT (update sparkflow/catalog.py + FIXTURES.md):\n  "
        + "\n  ".join(drift)
    )


def test_normalize_ts_folds_all_known_encodings(spark, tmp_path):
    """The loader's contract: the SAME instants written as timestamp[us],
    timestamp[ns], and raw int64-ns must all load to identical
    microsecond values through catalog.normalize_ts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkflow.catalog import normalize_ts

    us_vals = [1_704_067_200_000_000, 1_704_067_200_123_456, 1_706_745_599_999_999]
    variants = {
        "us": pa.table({"ts": pa.array(us_vals, pa.timestamp("us"))}),
        "ns": pa.table({"ts": pa.array([v * 1000 for v in us_vals], pa.timestamp("ns"))}),
        "ns_long": pa.table({"ts": pa.array([v * 1000 for v in us_vals], pa.int64())}),
    }
    got = {}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for name, tbl in variants.items():
        p = str(tmp_path / f"{name}.parquet")
        pq.write_table(tbl, p)
        df = normalize_ts(spark.read.parquet(p))
        assert dict(df.dtypes)["ts"] == "timestamp", (name, df.dtypes)
        got[name] = [
            r[0] for r in df.selectExpr("unix_micros(ts)").orderBy("ts").collect()
        ]
    assert got["us"] == got["ns"] == got["ns_long"] == sorted(us_vals)
