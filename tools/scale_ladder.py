"""100x measured scale ladder for the heaviest LLM operators (round-5
verdict item 4).

Extends the 10x smoke (tools/scale_smoke.py) along two axes:
- one more decade of data for the three worst ABSOLUTE scalers
  (llm_dedup_near, llm_dedup_clusters, llm_semdedup) — only the two
  tables they read (documents, embeddings) are replicated, streamed
  through a ParquetWriter so generation memory stays ~1 replica;
- per-query SHUFFLE BYTES and PEAK EXECUTOR MEMORY from the Spark REST
  API, not just wall time (a linear wall clock with superlinear shuffle
  is a latent OOM at the next decade).

Replica salts are the ones the 10x smoke proved out (SCALE.md): seeded
random char permutation for document text (decorrelates char shingles
across replicas), cyclic coordinate rotation + label re-bucketing for
embeddings (same-size quantizer cells, N_x as many).

Usage:
  python tools/scale_ladder.py gen   # write /tmp/sparkflow_scale100x
  python tools/scale_ladder.py run   # 1x / 10x / 100x matrix + metrics
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import scale_salt  # noqa: E402  (shared replica-salting scheme)

SRC = "/root/testdata/sf0.1"
DST10 = "/tmp/sparkflow_scale10x"
DST = "/tmp/sparkflow_scale100x"
# events-bearing 100x rung: the full-table replica corpus built by
# `scale_smoke.py gen 100 /tmp/sparkflow_sf10` (the sf10 bench corpus)
DST100_EV = "/tmp/sparkflow_sf10"
SKEW = "/tmp/sparkflow_skew100x"
REPLICAS = 100
OPS = ["llm_dedup_near", "llm_dedup_clusters", "llm_semdedup",
       "llm_dedup_containment"]
# round-7 extension (r5 verdict item 7): window + graph families, whose
# superlinear risks are a giant per-user window partition and the
# Σ out-deg² wedge bound — argued in docstrings, measured here
EV_OPS = ["win_gaps_islands", "graph_triangle_count"]


def gen() -> None:
    os.makedirs(DST, exist_ok=True)

    src = pq.read_table(f"{SRC}/documents.parquet")
    base = src.to_pandas()
    stride = int(base["doc_id"].max()) + 1
    scale_salt.check_fits(base["doc_id"], stride, REPLICAS, "documents.doc_id")
    with pq.ParquetWriter(f"{DST}/documents.parquet", src.schema) as w:
        for i in range(REPLICAS):
            r = base.copy()
            r["doc_id"] = r["doc_id"] + i * stride
            r["text"] = scale_salt.salt_text(r["text"], i)
            w.write_table(
                pa.Table.from_pandas(r, schema=src.schema, preserve_index=False)
            )
    print(f"documents: {len(base)} -> {len(base) * REPLICAS} rows")

    src = pq.read_table(f"{SRC}/embeddings.parquet")
    base = src.to_pandas()
    stride = int(base["vec_id"].max()) + 1
    n_labels = int(base["label"].max()) + 1
    scale_salt.check_fits(base["vec_id"], stride, REPLICAS, "embeddings.vec_id")
    scale_salt.check_fits(base["label"], n_labels, REPLICAS, "embeddings.label")
    with pq.ParquetWriter(f"{DST}/embeddings.parquet", src.schema) as w:
        for i in range(REPLICAS):
            r = base.copy()
            r["vec_id"] = r["vec_id"] + i * stride
            r["label"] = r["label"] + i * n_labels
            r["embedding"] = scale_salt.salt_embedding(r["embedding"], i)
            w.write_table(
                pa.Table.from_pandas(r, schema=src.schema, preserve_index=False)
            )
    print(f"embeddings: {len(base)} -> {len(base) * REPLICAS} rows")


def gen_skew(pct: int = 20) -> None:
    """Skewed-events rung: the 100x events table with pct% of all rows
    (by event_id modulus) remapped to ONE hot user. win_gaps_islands
    partitions its window by user_id, so the hot user becomes a single
    sorted partition on one core — the giant-partition hazard the r5
    verdict asked to measure instead of argue. pct=20 writes the
    standard skew100x rung; other values write
    /tmp/sparkflow_skew<pct> (the r7 hybrid-EWMA crossover study
    measures pct=80, where the hot key holds 8M of 10M rows)."""
    src_dir = DST100_EV if os.path.isdir(DST100_EV) else DST10
    dst = SKEW if pct == 20 else f"/tmp/sparkflow_skew{pct}"
    os.makedirs(dst, exist_ok=True)
    src = pq.read_table(f"{src_dir}/events.parquet")
    df = src.to_pandas()
    hot = (df["event_id"] % 100) < pct
    df.loc[hot, "user_id"] = 0
    pq.write_table(
        pa.Table.from_pandas(df, schema=src.schema, preserve_index=False),
        f"{dst}/events.parquet",
        row_group_size=250_000,
    )
    print(f"skew events ({src_dir} -> {dst}): {len(df)} rows, "
          f"{int(hot.sum())} on the hot user")


def _api(url: str):
    with urllib.request.urlopen(url, timeout=10) as resp:
        return json.load(resp)


class Metrics:
    """Cumulative shuffle/spill/peak-memory counters via the REST API;
    per-query numbers are deltas between snapshots.

    The REST base comes from THIS session's uiWebUrl, not a hardcoded
    port: if another local Spark UI already holds 4040 the session
    binds 4041+, and a fixed-port client would silently read a
    different application's (often idle) metrics as ours."""

    def __init__(self, spark):
        ui = spark.sparkContext.uiWebUrl
        assert ui, "Spark UI disabled — Metrics needs spark.ui.enabled=true"
        self.base = f"{ui}/api/v1"
        apps = _api(f"{self.base}/applications")
        assert apps, f"no applications visible at {self.base}"
        self.app = apps[0]["id"]

    def snapshot(self) -> dict:
        out = {"shuffle_write": 0, "shuffle_read": 0, "spill_disk": 0}
        for st in _api(f"{self.base}/applications/{self.app}/stages?status=complete"):
            out["shuffle_write"] += st.get("shuffleWriteBytes", 0)
            out["shuffle_read"] += st.get("shuffleReadBytes", 0)
            out["spill_disk"] += st.get("diskBytesSpilled", 0)
        return out

    def peak_heap(self) -> int:
        peak = 0
        for ex in _api(f"{self.base}/applications/{self.app}/executors"):
            pm = ex.get("peakMemoryMetrics") or {}
            peak = max(peak, pm.get("JVMHeapMemory", 0))
        return peak


def run() -> None:
    import sparkflow  # noqa: F401  (registers queries)
    from sparkflow import QUERIES
    from sparkflow.llm import dedup
    from sparkflow.session import get_spark

    # metrics need the UI's REST endpoint: build the session by hand with
    # the same knobs as get_spark but ui enabled
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("scale-ladder")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    m = Metrics(spark)

    print(f"{'op':18s} {'scale':>6s} {'rows':>10s} {'wall':>8s} "
          f"{'shufW':>9s} {'shufR':>9s} {'spill':>8s}")
    want = os.environ.get("SPARK_LADDER_SCALES", "1x,10x,100x").split(",")
    rows = []
    for sf_dir, tag in [(SRC, "1x"), (DST10, "10x"), (DST, "100x")]:
        if tag not in want:
            continue
        if not os.path.isdir(sf_dir):
            print(f"-- {tag}: {sf_dir} missing, skipped")
            continue
        # cold per SCALE, shared within it: llm_dedup_clusters reuses the
        # session-memoized pair set by design (one LSH pipeline per
        # session+dataset — clearing per op would both misrepresent the
        # pipeline and double peak memory by keeping two pair
        # checkpoints alive)
        dedup._PAIRS_CACHE.clear()
        for op in OPS:
            before = m.snapshot()
            t0 = time.perf_counter()
            n = QUERIES[op](spark, sf_dir).count()
            wall = time.perf_counter() - t0
            d = {k: v - before[k] for k, v in m.snapshot().items()}
            gib = 1 << 30
            print(f"{op:18s} {tag:>6s} {n:10d} {wall:7.1f}s "
                  f"{d['shuffle_write']/gib:8.2f}G {d['shuffle_read']/gib:8.2f}G "
                  f"{d['spill_disk']/gib:7.2f}G")
            rows.append((op, tag, n, wall, d))

    # window + graph families over the events-bearing corpora (r7):
    # 100x = the full-table replica tree; skew = 100x with a 20%-hot user
    gib = 1 << 30
    ev_rungs = [(SRC, "1x"), (DST10, "10x"), (DST100_EV, "100x"),
                (SKEW, "skew100x")]
    for sf_dir, tag in ev_rungs:
        if tag.replace("skew", "") not in want and tag not in want:
            continue
        if not os.path.isdir(sf_dir):
            print(f"-- {tag}: {sf_dir} missing, skipped")
            continue
        # skew rung ops (review r7): win_gaps_islands is skew-IMMUNE by
        # construction (it windows over distinct (user, day), <=31 rows
        # per user at any volume — the rung documents that immunity),
        # while win_ewma windows over RAW events per user, so the hot
        # user genuinely becomes one ~2M-row sorted window partition on
        # one core — the giant-partition hazard the r5 verdict asked to
        # MEASURE rather than argue
        ops = (EV_OPS if not tag.startswith("skew")
               else ["win_gaps_islands", "win_ewma", "win_ewma_segmented"])
        for op in ops:
            before = m.snapshot()
            t0 = time.perf_counter()
            df = QUERIES[op](spark, sf_dir)
            if op.startswith("win_ewma"):
                # count() alone lets Catalyst PRUNE a row-preserving
                # window entirely (no shuffle, no sort — measured 0.8 s
                # / zero shuffle for 10M rows before this fix); force
                # the computed column so the per-user sort actually runs
                from pyspark.sql import functions as F

                row = df.agg(
                    F.count(F.lit(1)), F.sum("ewma_value")
                ).first()
                n = row[0]
            else:
                n = df.count()
            wall = time.perf_counter() - t0
            d = {k: v - before[k] for k, v in m.snapshot().items()}
            print(f"{op:18s} {tag:>8s} {n:10d} {wall:7.1f}s "
                  f"{d['shuffle_write']/gib:8.2f}G {d['shuffle_read']/gib:8.2f}G "
                  f"{d['spill_disk']/gib:7.2f}G")
            rows.append((op, tag, n, wall, d))

    print(f"\npeak executor JVM heap: {m.peak_heap()/(1<<30):.2f} GiB "
          f"(cap {os.environ.get('SPARK_DRIVER_MEM', '8g')})")
    spark.stop()


def ab_prefilter() -> None:
    """Same-window A/B for the round-7 llm_dedup_near length prefilter:
    at each rung, count the pairs ENTERING the token-explode verify join
    with the prefilter off vs on (the join's cost driver — row counts,
    not wall time, per the load-drift note in BASELINE.md), and assert
    the FINAL verified pair set is identical both ways."""
    import time

    from sparkflow.llm.dedup import _near_pairs_plan
    from sparkflow.session import get_spark

    spark = get_spark("ab-prefilter")
    spark.sparkContext.setLogLevel("ERROR")
    # rung labels name the corpus (review r7): run()'s '1x' is sf0.1,
    # but the cheap prefilter sanity rung here is sf0.01 — labeling it
    # '1x' invited cross-mode comparisons off by 10x
    want = os.environ.get("SPARK_LADDER_SCALES", "sf0.01,10x,100x").split(",")
    for sf_dir, tag in [("/root/testdata/sf0.01", "sf0.01"), (DST10, "10x"),
                        (DST, "100x")]:
        if (tag not in want and tag.replace("sf0.01", "1x") not in want) \
                or not os.path.isdir(sf_dir):
            continue
        n_off = _near_pairs_plan(spark, sf_dir, length_prefilter=False,
                                 verify_input_only=True).count()
        n_on = _near_pairs_plan(spark, sf_dir, length_prefilter=True,
                                verify_input_only=True).count()
        # pair-set equality DISTRIBUTED (exceptAll both ways) — at 100x
        # the verified set is tens of millions of pairs; a driver-side
        # python set was the first version's OOM
        t0 = time.perf_counter()
        d_off = _near_pairs_plan(
            spark, sf_dir, length_prefilter=False
        ).select("doc_a", "doc_b").localCheckpoint()
        t_off = time.perf_counter() - t0
        t0 = time.perf_counter()
        d_on = _near_pairs_plan(spark, sf_dir).select(
            "doc_a", "doc_b"
        ).localCheckpoint()
        t_on = time.perf_counter() - t0
        extra = d_off.exceptAll(d_on).count() + d_on.exceptAll(d_off).count()
        n_pairs = d_on.count()
        print(
            f"{tag:>5s}: verify-input pairs {n_off} -> {n_on} "
            f"({100 * (1 - n_on / max(n_off, 1)):.1f}% cut)  "
            f"identical_pair_set={extra == 0} ({n_pairs} pairs)  "
            f"wall off/on {t_off:.1f}/{t_on:.1f}s (same window)",
            flush=True,
        )
        assert extra == 0, f"{tag}: pair set changed!"
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if mode == "gen":
        gen()
    elif mode == "gen_skew":
        gen_skew(int(sys.argv[2]) if len(sys.argv) > 2 else 20)
    elif mode == "run":
        run()
    elif mode == "ab_prefilter":
        ab_prefilter()
    else:
        raise SystemExit("usage: scale_ladder.py [gen|gen_skew|run|ab_prefilter]")
