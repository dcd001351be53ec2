"""Custom connector via the PySpark 4 Python DataSource API — the
"write your own source" surface a pattern repo demonstrates with a
custom SourceFunction/InputFormat.

The format here is deliberately one Spark has no built-in reader for: a
directory of `docmeta-*.txt` files, one line per record,
`doc_id|lang|n_chars`. The DataSource plans ONE InputPartition PER FILE
(the unit of parallel work — at 100 TB, file = split, and Spark
schedules them across executors exactly like a built-in format), and
each partition's `read` streams lines without materializing the file.

Python-source rows cross into the JVM via Arrow batches; for a format
with columnar native readers, a built-in format wins — the custom API is
for systems Spark cannot otherwise reach (this is documented, not
hidden).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..catalog import table
from ..registry import register

_TMP = "/tmp/sparkflow_io"
_N_FILES = 4


class _DocMetaReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]

    def partitions(self):
        files = sorted(
            f for f in os.listdir(self.path) if f.startswith("docmeta-")
        )
        return [InputPartition(os.path.join(self.path, f)) for f in files]

    def read(self, partition):
        with open(partition.value, encoding="utf-8") as fh:
            for line in fh:
                doc_id, lang, n_chars = line.rstrip("\n").split("|")
                yield (int(doc_id), lang, int(n_chars))


class DocMetaSource(DataSource):
    """`spark.read.format("docmeta")` — one partition per file."""

    @classmethod
    def name(cls):
        return "docmeta"

    def schema(self):
        return "doc_id BIGINT, lang STRING, n_chars BIGINT"

    def reader(self, schema):
        return _DocMetaReader(self.options)


def _stage_files(spark: SparkSession, sf_dir: str) -> str:
    """Export documents metadata to the custom line format, once per
    (application, sf). Files get deterministic doc_id-range splits.

    FIXTURE STAGING, not the operator's data path: this materializes the
    foreign format the connector exists to read (in production that data
    already lives in the external system). The driver-side toPandas here
    is the test harness building its fixture; the connector itself reads
    partition-parallel with no driver involvement."""
    sfkey = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    out = os.path.join(
        _TMP, "docmeta", spark.sparkContext.applicationId, sfkey
    )
    if not os.path.isdir(out):
        os.makedirs(out, exist_ok=True)
        rows = (
            table(spark, sf_dir, "documents")
            .select("doc_id", "lang", "n_chars")
            .toPandas()
            .sort_values("doc_id")
        )
        step = (len(rows) + _N_FILES - 1) // _N_FILES
        for i in range(_N_FILES):
            part = rows.iloc[i * step : (i + 1) * step]
            with open(os.path.join(out, f"docmeta-{i}.txt"), "w", encoding="utf-8") as fh:
                for r in part.itertuples():
                    fh.write(f"{r.doc_id}|{r.lang}|{r.n_chars}\n")
    return out


@register(
    "source_custom_python",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def source_custom_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read a format Spark doesn't know (pipe-delimited docmeta files)
    through a registered Python DataSource, then aggregate — proving the
    custom connector feeds the full engine like any built-in source.
    The staging export runs once; the oracle is the same aggregation on
    the original table (round-trip equality is what's under test)."""
    path = _stage_files(spark, sf_dir)
    spark.dataSource.register(DocMetaSource)
    df = spark.read.format("docmeta").option("path", path).load()
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Custom STREAMING source (offset-tracked) — pytest-exercised twin
# ---------------------------------------------------------------------------

_SLICES = 5


class _EventSliceStreamReader(SimpleDataSourceStreamReader):
    """Replays the events table in `_SLICES` offset-tracked micro-batches
    (offset = slice index over event_id ranges) — the Kafka-shaped
    contract: resumable offsets, re-readable ranges (readBetweenOffsets
    is what checkpoint recovery calls), deterministic content."""

    def __init__(self, options):
        self.path = options["events_parquet"]
        self.lo = int(options["min_id"])
        self.hi = int(options["max_id"])  # inclusive
        self.step = (self.hi - self.lo + _SLICES) // _SLICES

    def initialOffset(self):
        return {"slice": 0}

    def _rows(self, s):
        import pyarrow.parquet as pq

        t = pq.read_table(self.path, columns=["event_id", "user_id", "value"])
        lo = self.lo + s * self.step
        hi = min(self.lo + (s + 1) * self.step, self.hi + 1)
        out = []
        for eid, uid, val in zip(
            t.column("event_id").to_pylist(),
            t.column("user_id").to_pylist(),
            t.column("value").to_pylist(),
        ):
            if lo <= eid < hi:
                out.append((eid, uid, val))
        return out

    def read(self, start):
        s = start["slice"]
        if s >= _SLICES:
            return iter([]), {"slice": s}
        return iter(self._rows(s)), {"slice": s + 1}

    def readBetweenOffsets(self, start, end):
        out = []
        for s in range(start["slice"], end["slice"]):
            out.extend(self._rows(s))
        return iter(out)


class EventSliceStreamSource(DataSource):
    @classmethod
    def name(cls):
        return "event_slices"

    def schema(self):
        return "event_id BIGINT, user_id BIGINT, value DOUBLE"

    def simpleStreamReader(self, schema):
        return _EventSliceStreamReader(self.options)
