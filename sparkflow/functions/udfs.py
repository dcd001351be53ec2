"""UDF / UDAF / UDTF surface (SURVEY §2.10).

Flink-side equivalents: ScalarFunction, AggregateFunction /
ProcessWindowFunction, TableFunction.

These four operators exist to exercise the user-extension surface — the
rest of the engine deliberately avoids Python in the row path. Ranked by
100 TB suitability:
  pandas_udf / applyInPandas (Arrow-batched)  ≫  row-at-a-time F.udf.
The scalar F.udf entry is the anti-pattern kept for API parity; its
pandas twin computes the same thing ~10-100× faster.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf
from pyspark.sql.types import StringType

from ..catalog import table
from ..registry import register

_BRACKET_SQL = """
    CASE WHEN o_totalprice < 100000 THEN 'low'
         WHEN o_totalprice < 300000 THEN 'standard'
         WHEN o_totalprice < 450000 THEN 'premium'
         ELSE 'luxury' END
"""


@register(
    "udf_scalar",
    oracle=f"""
    SELECT o_orderkey, {_BRACKET_SQL} AS bracket
    FROM orders
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (Flink ScalarFunction analog)."""

    @udf(returnType=StringType())
    def bracket(price: float) -> str:
        if price < 100000:
            return "low"
        if price < 300000:
            return "standard"
        if price < 450000:
            return "premium"
        return "luxury"

    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", bracket("o_totalprice").alias("bracket"))


@register(
    "udf_pandas",
    oracle=f"""
    SELECT o_orderkey, {_BRACKET_SQL} AS bracket,
           LEAST(o_totalprice, 300000.0) * 0.1 AS capped_fee
    FROM orders
    """,
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Arrow pandas UDF — same bracket logic over whole
    columns per batch. This is the 100 TB-sane way to run Python."""

    @pandas_udf(StringType())
    def bracket_vec(price: pd.Series) -> pd.Series:
        return pd.cut(
            price,
            bins=[float("-inf"), 100000, 300000, 450000, float("inf")],
            labels=["low", "standard", "premium", "luxury"],
            right=False,
        ).astype(str)

    @pandas_udf("double")
    def capped_fee(price: pd.Series) -> pd.Series:
        return price.clip(upper=300000.0) * 0.1

    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        bracket_vec("o_totalprice").alias("bracket"),
        capped_fee("o_totalprice").alias("capped_fee"),
    )


@register(
    "udaf_grouped_map",
    oracle="""
    SELECT event_id, event_type,
           ROUND((value - AVG(value) OVER (PARTITION BY event_type))
                 / STDDEV_SAMP(value) OVER (PARTITION BY event_type), 6) AS value_z
    FROM events
    """,
)
def udaf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group normalization via applyInPandas (Flink
    AggregateFunction/ProcessWindowFunction analog): each group arrives
    as one pandas DataFrame over Arrow. Output rounded — pandas and the
    oracle accumulate variance differently at the 1e-12 level."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf["value"].mean()
        std = pdf["value"].std(ddof=1)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "value_z": ((pdf["value"] - mean) / std).round(6),
            }
        )

    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").applyInPandas(
        normalize, schema="event_id long, event_type string, value_z double"
    )


@register(
    "udtf_generator",
    oracle="""
    SELECT doc_id,
           UNNEST(STRING_SPLIT(text, ' ')) AS token,
           UNNEST(RANGE(1, LEN(STRING_SPLIT(text, ' ')) + 1)) AS pos
    FROM documents WHERE lang = 'zh'
    """,
)
def udtf_generator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Flink TableFunction analog): one input row → N output
    rows with position. (Parallel UNNESTs zip in the DuckDB oracle.)"""

    @udtf(returnType="token: string, pos: int")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" "), start=1):
                yield tok, i

    spark.udtf.register("sparkflow_tokenize", Tokenize)
    d = table(spark, sf_dir, "documents").filter(F.col("lang") == "zh")
    d.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM udtf_docs d, LATERAL sparkflow_tokenize(d.text) t
        """
    )


@register(
    "udtf_table_arg",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS total_value
    FROM orders GROUP BY o_orderpriority
    """,
)
def udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-argument UDTF (PySpark 4: `SELECT * FROM f(TABLE(t)
    PARTITION BY k)`): a per-partition summarizer that consumes a whole
    relation — the polymorphic table function surface (Flink's
    ProcessTableFunction direction). Each partition's rows stream
    through eval(); terminate() emits the summary, so state is one
    accumulator per group no matter the partition size. Rows arrive in
    arbitrary order — the accumulator is integer cents, so the total is
    order-independent and exact. The oracle is the plain GROUP BY the
    UDTF reimplements (the API surface, not the plan, is what's under
    test: for pure aggregation the built-in agg is the fast path)."""

    @udtf(returnType="priority STRING, n_orders BIGINT, total_value DOUBLE")
    class SummarizeOrders:
        def __init__(self):
            self.key = None
            self.n = 0
            self.cents = 0

        def eval(self, row):
            self.key = row["o_orderpriority"]
            self.n += 1
            self.cents += int(row["o_totalprice"] * 100 + 0.5)

        def terminate(self):
            if self.key is not None:
                yield self.key, self.n, self.cents / 100.0

    spark.udtf.register("sparkflow_summarize_orders", SummarizeOrders)
    table(spark, sf_dir, "orders").createOrReplaceTempView("udtf_orders")
    return spark.sql(
        """
        SELECT * FROM sparkflow_summarize_orders(
          TABLE(udtf_orders) PARTITION BY o_orderpriority
        )
        """
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the lowest-overhead Python extension point: batches
    arrive as raw pyarrow RecordBatches (no pandas conversion at all),
    ideal for columnar libraries that speak Arrow natively (polars,
    numpy via zero-copy buffers). Here each batch computes discounted
    revenue in integer cents with pyarrow.compute kernels; Spark then
    finishes the group-by. The batch step is a pure map — partial
    aggregation stays in the JVM, so the shuffle carries only
    per-batch-reduced columns.

    The cents math mirrors oracle_compat: floor(x·100 + 0.5) on the
    IEEE product, computed by pc.floor on float64 — bit-identical to
    both the JVM expression and DuckDB."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def per_batch(batches):
        for b in batches:
            price = b.column("l_extendedprice")
            disc = b.column("l_discount")
            rev = pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
            cents = pc.cast(
                pc.floor(pc.add(pc.multiply(rev, pa.scalar(100.0)), pa.scalar(0.5))),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("l_returnflag"), cents], ["l_returnflag", "rev_cents"]
            )

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount"
    )
    mapped = li.mapInArrow(per_batch, "l_returnflag string, rev_cents long")
    return mapped.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("rev_cents").cast("bigint").alias("revenue_cents"),
    )


@register(
    "udtf_analyze_polymorphic",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts
      FROM documents WHERE lang = 'fr'
    )
    SELECT doc_id,
           ts[pos] AS w0, ts[pos + 1] AS w1, ts[pos + 2] AS w2,
           CAST(pos AS INT) AS pos
    FROM (SELECT doc_id, ts, UNNEST(range(1, len(ts) - 1)) AS pos
          FROM toks WHERE len(ts) >= 3)
    """,
)
def udtf_analyze_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC UDTF (PySpark 4 static `analyze`): the output schema
    is computed at plan time FROM THE ARGUMENTS — here an n-gram
    generator whose column count (w0..w{n-1}) derives from the literal
    n. This is the table-function shape Flink exposes via type
    inference on TableFunction: one implementation, schema per call
    site. Catalyst sees a fully-resolved schema (no runtime surprises);
    only the literal-argument value crosses into analyze(). Called with
    n=3 over the fr-language docs; the oracle zips DuckDB list slices."""
    from pyspark.sql.types import IntegerType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class NGrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(n.value, int) or n.value < 1:
                raise ValueError("n must be a positive integer literal")
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"w{i}", StringType())
            return AnalyzeResult(schema.add("pos", IntegerType()))

        def eval(self, text: str, n: int):
            toks = text.split(" ")
            for i in range(len(toks) - n + 1):
                yield (*toks[i : i + n], i + 1)

    spark.udtf.register("sparkflow_ngrams", NGrams)
    d = table(spark, sf_dir, "documents").filter(F.col("lang") == "fr")
    d.createOrReplaceTempView("udtf_ngram_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.w0, t.w1, t.w2, t.pos
        FROM udtf_ngram_docs d, LATERAL sparkflow_ngrams(d.text, 3) t
        """
    )
