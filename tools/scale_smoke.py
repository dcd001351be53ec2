"""10x synthetic scale smoke (round-3 verdict item 6).

Converts "the plans look right at 100x" into a measured data point:
generate a 10x replica of sf0.1 (~170 MB) with CONSISTENT key remaps,
run the 8 bench queries plus the 5 scale-sensitive LLM operators at 1x
and 10x, and report the wall-time ratio per query. A healthy
(shuffle-partial, broadcast-correct, pushdown-clean) plan should grow
sublinearly at this size — fixed dispatch overheads amortize; anything
superlinear is a red flag worth a plan audit.

Remap design (what makes the 10x workload COMPARABLE, not degenerate):
- Facts replicate 10x with per-replica key offsets (max+1 stride), and
  every FK gets the SAME offset as its dimension, so join fan-outs per
  replica are identical to sf0.1. Tiny dims (region/nation) stay fixed.
- documents.text: replica i applies a seeded RANDOM permutation of
  [a-z0-9] to every character (spaces fixed). The dedup pipeline
  shingles CHARACTER 5-grams, so the salt must perturb word INTERIORS:
  a char bijection keeps every within-replica shingle/Jaccard
  relationship exactly isomorphic to sf0.1, while a random permutation
  makes a cross-replica 5-gram collision require sigma_j^-1(sigma_i(s))
  to land back in the tiny shingle vocabulary — ~|S|/36^5, negligible.
  (Two failed attempts, measured: a per-token "~i" suffix leaves word
  interiors byte-identical across replicas — pair fetch blew past
  spark.driver.maxResultSize; a Caesar shift preserves structural
  alignment between replicas' vocabularies — 19.9x pairs instead of
  10x. Both are bijections; only the seeded random permutation
  decorrelates 5-grams.) Length is preserved, so n_chars stays valid.
- embeddings.embedding: replica i cyclically rotates coordinates by i
  (norm- and within-replica-similarity-preserving, cross-replica
  decorrelated); label += i * n_labels models the honest scale-up
  (more data -> more quantizer cells of the SAME size, keeping
  cell-partitioned ops linear; 10x bigger cells would be a data
  degeneracy, not an operator property).
- events: id offsets only; timestamps unchanged (same hour buckets,
  10x rows per bucket — pure aggregation throughput).

Usage:
  python tools/scale_smoke.py gen   # write /tmp/sparkflow_scale10x
  python tools/scale_smoke.py run   # time 1x vs 10x, print the table
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import scale_salt  # noqa: E402  (shared replica-salting scheme)

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sparkflow_scale10x"
REPLICAS = 10
# `gen N DST` overrides both (e.g. `gen 100 /tmp/sparkflow_sf10` builds
# the 60M-row lineitem rung for tools/bench_sf1.py's sf10 table)

# table -> columns that get the per-replica offset of the named entity
_KEYED = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
_COPY_AS_IS = ["region", "nation"]


def _strides() -> dict[str, int]:
    """One stride per entity: max key + 1 over every column that carries
    it (so offset replicas never collide, dense keys or not)."""
    cols = {
        "cust": [("customer", "c_custkey"), ("orders", "o_custkey")],
        "order": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
        "part": [("part", "p_partkey"), ("lineitem", "l_partkey")],
        "supp": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
        "event": [("events", "event_id")],
        "user": [("events", "user_id")],
        "doc": [("documents", "doc_id")],
        "vec": [("embeddings", "vec_id")],
    }
    out = {}
    for ent, refs in cols.items():
        m = 0
        for tbl, col in refs:
            m = max(m, int(pq.read_table(f"{SRC}/{tbl}.parquet", columns=[col])[col].to_numpy().max()))
        out[ent] = m + 1
    return out


def gen() -> None:
    os.makedirs(DST, exist_ok=True)
    strides = _strides()
    for tbl in _COPY_AS_IS:
        pq.write_table(pq.read_table(f"{SRC}/{tbl}.parquet"), f"{DST}/{tbl}.parquet")
        print(f"{tbl}: copied")
    for tbl, keycols in _KEYED.items():
        src = pq.read_table(f"{SRC}/{tbl}.parquet")
        schema = src.schema
        base = src.to_pandas()
        if tbl == "embeddings":
            n_labels = int(base["label"].max()) + 1
            # label is offset per replica too (i * n_labels) — same
            # overflow hazard as the key columns (review r5)
            scale_salt.check_fits(base["label"], n_labels, REPLICAS, f"{tbl}.label")
        for col, ent in keycols.items():
            scale_salt.check_fits(base[col], strides[ent], REPLICAS, f"{tbl}.{col}")
        reps = []
        for i in range(REPLICAS):
            r = base.copy()
            for col, ent in keycols.items():
                r[col] = r[col] + i * strides[ent]
            if tbl == "documents":
                r["text"] = scale_salt.salt_text(r["text"], i)
            if tbl == "embeddings":
                r["label"] = r["label"] + i * n_labels
                r["embedding"] = scale_salt.salt_embedding(r["embedding"], i)
            reps.append(r)
        big = pd.concat(reps, ignore_index=True)
        # 250k-row row groups: parquet scans split at ROW-GROUP
        # boundaries, and pyarrow's default (~1M rows) capped the whole
        # bench at n_rowgroups-way parallelism — measured: a 1M-row
        # events replica was ONE row group, so from_json ran
        # single-threaded (2.0 s) while the 10M-row corpus got 10 tasks
        # (2.5 s). Real ingest pipelines target 64-256 MB groups for the
        # same reason.
        pq.write_table(
            pa.Table.from_pandas(big, schema=schema, preserve_index=False),
            f"{DST}/{tbl}.parquet",
            row_group_size=250_000,
        )
        print(f"{tbl}: {len(base)} -> {len(big)} rows")


def run() -> None:
    import sparkflow
    from bench import BENCH_QUERIES
    from sparkflow.session import get_spark

    llm_ops = [
        "llm_dedup_near",
        "llm_semdedup",
        "llm_knn_ivf",
        "llm_hard_negatives",
        "llm_dedup_clusters",
        "llm_winnowing_overlap",
    ]
    spark = get_spark("scale-smoke", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def timed(fn, sf_dir):
        t0 = time.perf_counter()
        n = len(fn(spark, sf_dir).toPandas())
        return time.perf_counter() - t0, n

    rows = []
    suite = {**BENCH_QUERIES, **{k: sparkflow.QUERIES[k] for k in llm_ops}}
    for name, fn in suite.items():
        t1, n1 = timed(fn, SRC)
        t10, n10 = timed(fn, DST)
        rows.append((name, t1, n1, t10, n10, t10 / t1))
        print(
            f"{name:22s} 1x {t1:7.2f}s ({n1:8d} rows)   "
            f"10x {t10:7.2f}s ({n10:8d} rows)   ratio {t10 / t1:5.2f}x"
        )
    worst = max(rows, key=lambda r: r[5])
    print(f"\nworst ratio: {worst[0]} {worst[5]:.2f}x (10x data)")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if len(sys.argv) > 2:
        REPLICAS = int(sys.argv[2])
    if len(sys.argv) > 3:
        DST = sys.argv[3]
    if mode == "gen":
        gen()
    elif mode == "run":
        run()
    else:
        raise SystemExit("usage: scale_smoke.py [gen|run] [replicas] [dst]")
