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
REPLICAS = 100
OPS = ["llm_dedup_near", "llm_dedup_clusters", "llm_semdedup"]


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
    print(f"\npeak executor JVM heap: {m.peak_heap()/(1<<30):.2f} GiB "
          f"(cap {os.environ.get('SPARK_DRIVER_MEM', '8g')})")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if mode == "gen":
        gen()
    elif mode == "run":
        run()
    else:
        raise SystemExit("usage: scale_ladder.py [gen|run]")
