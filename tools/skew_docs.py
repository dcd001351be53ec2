"""Skewed-DOCUMENT rung for the round-7 pair ops (VERDICT r7 item 7).

llm_dedup_containment (rare-gram blocking, absolute df cap 8) and
llm_winnowing_overlap_aligned (hash-only buckets, occurrence cap 64)
carry explicit cost caps designed for exactly one corpus shape: shared
BOILERPLATE — one hot source whose grams appear in a large fraction of
all documents, where an uncapped posting-list/bucket self-join goes
quadratic. Round 7 measured both ops only on the uniform ladder; this
tool builds the boilerplate-skewed twin and measures the caps doing
their job:

- corpus: the 10x documents replica (50k docs) with ONE fixed ~240-char
  boilerplate paragraph prepended to 30% of documents (doc_id % 10 < 3)
  — every boilerplate gram lands in ~15k documents, 3-4 orders of
  magnitude over both caps;
- telemetry per (corpus, op): wall time, output rows, shuffle
  read/write + spill deltas (Spark REST API, tools/scale_ladder.Metrics)
  AND the cap's own account: Σdf and Σdf² of the posting lists BEFORE
  and AFTER the cap (Σdf² is the exact pair-candidate count the
  self-join would generate — the number the cap exists to bound).

Healthy result = the capped Σdf² on the skewed twin stays within ~2x of
the uniform rung (boilerplate grams are DROPPED, not joined), wall/
shuffle move proportionally, and output changes only by the pairs the
boilerplate legitimately creates. A superlinear blowup here means the
cap leaks — that is what this rung exists to catch.

Usage:
  python tools/skew_docs.py gen    # write /tmp/sparkflow_skewdocs
  python tools/skew_docs.py run    # uniform-10x vs skewed-10x matrix
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC10 = "/tmp/sparkflow_scale10x"
DST = "/tmp/sparkflow_skewdocs"
SKEW_PCT = 30  # doc_id % 10 < 3

# one fixed paragraph, prepended verbatim — its grams are the hot keys
BOILERPLATE = (
    "this document is provided as is without warranty of any kind either "
    "express or implied including but not limited to the implied warranties "
    "of merchantability fitness for a particular purpose or noninfringement "
    "all rights reserved worldwide "
)

OPS = [
    "llm_dedup_containment",
    "llm_winnowing_overlap_aligned",
    # r8: exact-recall prefix-filtering dedup — its cost is df-shaped
    # (rarest-first prefixes), so the boilerplate rung is exactly the
    # corpus that would stress it
    "llm_dedup_near_prefix",
]


def gen() -> None:
    os.makedirs(DST, exist_ok=True)
    src = pq.read_table(f"{SRC10}/documents.parquet")
    df = src.to_pandas()
    hot = (df["doc_id"] % 10) < (SKEW_PCT // 10)
    df.loc[hot, "text"] = BOILERPLATE + df.loc[hot, "text"]
    # n_chars rides along in the fixture schema — keep it truthful
    if "n_chars" in df.columns:
        df.loc[hot, "n_chars"] = df.loc[hot, "text"].str.len()
    pq.write_table(
        pa.Table.from_pandas(df, schema=src.schema, preserve_index=False),
        f"{DST}/documents.parquet",
    )
    print(f"skew docs: {len(df)} rows, {int(hot.sum())} with boilerplate "
          f"({len(BOILERPLATE)} chars prepended)")


def _cap_account(spark, sf_dir: str) -> dict:
    """Σdf / Σdf² before and after each op's cap — the candidate-pair
    budget the caps bound. Containment counts per-DOCUMENT df over
    distinct char-8-grams (cap 8); winnowing counts total OCCURRENCES
    per gram hash (cap 64). Both reuse the ops' own staging functions so
    the account can't drift from the operators."""
    from pyspark.sql import functions as F

    from sparkflow.llm.dedup import (
        _CONTAIN_DF_CAP,
        _CONTAIN_GRAM,
        contain_corpus,
    )
    from sparkflow.llm.winnow import _WFP_MAX_DF, _fpset, dup_corpus

    out = {}
    sh = (
        contain_corpus(spark, sf_dir)
        .filter(F.length("text") >= _CONTAIN_GRAM)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("text") - (_CONTAIN_GRAM - 1)),
                    lambda i: F.substring(F.col("text"), i, _CONTAIN_GRAM),
                )
            ).alias("g"),
        )
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    row = sh.agg(
        F.sum("df").alias("s1"),
        F.sum(F.col("df") * F.col("df")).alias("s2"),
        F.sum(F.when(F.col("df") <= _CONTAIN_DF_CAP, F.col("df"))).alias("k1"),
        F.sum(
            F.when(F.col("df") <= _CONTAIN_DF_CAP, F.col("df") * F.col("df"))
        ).alias("k2"),
    ).first()
    out["contain"] = {
        "sum_df": int(row["s1"]), "sum_df2": int(row["s2"]),
        "kept_sum_df": int(row["k1"] or 0), "kept_sum_df2": int(row["k2"] or 0),
    }
    hx = (
        _fpset(dup_corpus(spark, sf_dir))
        .select(F.expr("fp DIV 4294967296").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    row = hx.agg(
        F.sum("df").alias("s1"),
        F.sum(F.col("df") * F.col("df")).alias("s2"),
        F.sum(F.when(F.col("df") <= _WFP_MAX_DF, F.col("df"))).alias("k1"),
        F.sum(
            F.when(F.col("df") <= _WFP_MAX_DF, F.col("df") * F.col("df"))
        ).alias("k2"),
    ).first()
    out["winnow"] = {
        "sum_df": int(row["s1"]), "sum_df2": int(row["s2"]),
        "kept_sum_df": int(row["k1"] or 0), "kept_sum_df2": int(row["k2"] or 0),
    }
    return out


def run() -> None:
    import sparkflow
    from tools.scale_ladder import Metrics

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("skew-docs")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    m = Metrics(spark)
    gib = 1 << 30
    results = {}
    for sf_dir, tag in [(SRC10, "uniform10x"), (DST, "skew10x")]:
        if not os.path.isdir(sf_dir):
            raise SystemExit(f"{sf_dir} missing — run gen first")
        acct = _cap_account(spark, sf_dir)
        results[tag] = {"cap_account": acct}
        for op in OPS:
            before = m.snapshot()
            t0 = time.perf_counter()
            n = sparkflow.QUERIES[op](spark, sf_dir).count()
            wall = time.perf_counter() - t0
            d = {k: v - before[k] for k, v in m.snapshot().items()}
            results[tag][op] = {
                "rows": n, "wall_sec": round(wall, 1),
                "shuffle_write_gib": round(d["shuffle_write"] / gib, 2),
                "shuffle_read_gib": round(d["shuffle_read"] / gib, 2),
                "spill_gib": round(d["spill_disk"] / gib, 2),
            }
            print(f"{tag:11s} {op:30s} {n:8d} rows {wall:7.1f}s "
                  f"shufW {d['shuffle_write']/gib:6.2f}G "
                  f"spill {d['spill_disk']/gib:5.2f}G")
        for fam, a in acct.items():
            print(f"{tag:11s} {fam}: sum_df2 {a['sum_df2']:.3e} -> kept "
                  f"{a['kept_sum_df2']:.3e} "
                  f"(dropped {100 * (1 - a['kept_sum_df2']/a['sum_df2']):.1f}%)")
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if mode == "gen":
        gen()
    elif mode == "run":
        run()
    else:
        raise SystemExit("usage: skew_docs.py [gen|run]")
