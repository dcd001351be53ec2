"""ANN recall-vs-cost ladder at 1× and 10× (r9 verdict item 5).

The fixture-scale pytest pins recall at sf0.1 only; this tool measures
the same two approximate operators on the 10× replica corpus
(tools/scale_smoke.py gen → /tmp/sparkflow_scale10x, whose embedding
replicas are decorrelated by cyclic coordinate rotation and whose
labels are re-bucketed into 10× as many same-size quantizer cells —
the honest scale-up for a label-as-codebook IVF: more data AND more
cells, like a real k-means codebook regrown at scale).

- IVF (`llm_knn_ivf`): recall@10 for the probe query vs brute force,
  swept over nprobe, with cost = nprobe/n_cells (equal-size cells ⇒
  fraction of rows scanned) and wall per run. The claim to check: at
  10× the SAME nprobe probes 10× less of the corpus, so recall at
  fixed nprobe may drop — the invariant that must hold is recall as a
  function of the FRACTION scanned, not of nprobe.
- LSH (`llm_knn_all_pairs_lsh`): per-vector best-neighbor quality vs
  brute-force top-10 (the pytest's metric: coverage = vectors with any
  neighbor, hit = best neighbor in true top-10), swept over
  (n_tables, n_bits), with cost = deduped candidate-pair count and
  wall. Brute force at 10× is a 20k×20k float32 blocked matmul —
  seconds in numpy.

Usage: python tools/ann_recall_ladder.py [--skip-10x]
Prints one JSON document; SCALE.md records the table.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sparkflow  # noqa: E402
from sparkflow.llm.similarity import (  # noqa: E402
    llm_knn_all_pairs_lsh,
    llm_knn_ivf,
)
from sparkflow.session import get_spark  # noqa: E402

CORPORA = [("1x", "/root/testdata/sf0.1")]
if "--skip-10x" not in sys.argv:
    CORPORA.append(("10x", "/tmp/sparkflow_scale10x"))

NPROBES = [1, 3, 5, 10]
LSH_CONFIGS = [(4, 4), (4, 6), (8, 6), (8, 8)]


def brute(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    ids = emb["vec_id"].to_numpy()
    X = np.stack(emb["embedding"].to_numpy()).astype("float32")
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    n = len(ids)
    top10 = np.empty((n, 10), dtype=ids.dtype)
    B = 2048
    for i in range(0, n, B):
        S = Xn[i:i + B] @ Xn.T
        for r in range(S.shape[0]):
            S[r, i + r] = -2.0
        order = np.argpartition(-S, 10, axis=1)[:, :10]
        # exact order within the top-10 slab
        for r in range(S.shape[0]):
            o = order[r][np.argsort(-S[r, order[r]])]
            top10[i + r] = ids[o]
    return ids, top10


def main():
    spark = get_spark("ann-ladder", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = {"load_1m": os.getloadavg()[0]}

    for tag, sf in CORPORA:
        if not os.path.isdir(sf):
            print(f"# {sf} missing — run tools/scale_smoke.py gen",
                  file=sys.stderr)
            continue
        row = {}
        print(f"# {tag}: brute force...", file=sys.stderr, flush=True)
        t0 = time.time()
        ids, top10 = brute(spark, sf)
        row["n_vecs"] = int(len(ids))
        row["brute_force_sec"] = round(time.time() - t0, 2)
        idx = {v: i for i, v in enumerate(ids)}
        n_cells = int(
            sparkflow.catalog.table(spark, sf, "embeddings")
            .select("label").distinct().count())
        row["n_cells"] = n_cells

        # --- IVF: single-query recall@10 (query = _query_row's vec) ---
        # _query_row probes MIN(vec_id), which is only 0 on corpora whose
        # ids start at 0 — index by the actual minimum, not position 0.
        true_q = set(top10[idx[int(ids.min())]])
        ivf = []
        for npb in NPROBES + [n_cells]:
            print(f"# {tag}: ivf nprobe={npb}", file=sys.stderr, flush=True)
            t0 = time.time()
            got = set(llm_knn_ivf(spark, sf, npb).toPandas()["vec_id"])
            ivf.append({
                "nprobe": npb,
                "fraction_scanned": round(npb / n_cells, 3),
                "recall_at_10": round(len(got & true_q) / 10.0, 2),
                "wall_sec": round(time.time() - t0, 2),
            })
        row["ivf"] = ivf

        # --- LSH: all-pairs best-neighbor quality ---
        from pyspark.sql import functions as F

        from sparkflow.llm.similarity import _bucket_codes_udf

        lsh = []
        for n_tables, n_bits in LSH_CONFIGS:
            print(f"# {tag}: lsh {n_tables}x{n_bits}",
                  file=sys.stderr, flush=True)
            t0 = time.time()
            df = llm_knn_all_pairs_lsh(spark, sf, n_tables, n_bits)
            pdf = df.toPandas()
            wall = time.time() - t0
            m = dict(zip(pdf["vec_id"], pdf["neighbor_id"]))
            hits = [m[v] in set(top10[idx[v]]) for v in ids if v in m]
            # cost = deduped candidate pairs the exact rescorer touches
            codes = _bucket_codes_udf(
                n_tables, n_bits, table_stride=max(100, 1 << n_bits))
            b = (sparkflow.catalog.table(spark, sf, "embeddings")
                 .select("vec_id",
                         F.explode(codes("embedding")).alias("bucket")))
            cand = (
                b.toDF("va", "bucket")
                .join(b.toDF("vb", "bucket"), "bucket")
                .filter(F.col("va") < F.col("vb"))
                .select("va", "vb").distinct().count()
            )
            lsh.append({
                "tables_bits": f"{n_tables}x{n_bits}",
                "coverage": round(len(m) / len(ids), 3),
                "hit_rate": round(float(np.mean(hits)), 3) if hits else 0.0,
                "candidate_pairs": int(cand),
                "pairs_vs_all": round(
                    cand / (len(ids) * (len(ids) - 1) / 2), 4),
                "wall_sec": round(wall, 2),
            })
        row["lsh"] = lsh
        out[tag] = row

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
