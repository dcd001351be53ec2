"""Dataset curation operators for LLM training-data pipelines: the
deterministic splitting/sampling/scrubbing stages that sit between dedup
and training (task brief: first-class pipeline components).

Scale design: every operator here is hash-driven and stateless — split
membership is a pure function of the row (md5 of a stable key), so it
needs NO shuffle, NO global coordination, and reproduces identically on
any cluster size or run. That property (and not randomness quality) is
why production pipelines split by hash rather than rand(): resuming a
100 TB job, or re-running one partition, must not reshuffle the split.
The stratified sampler's only shuffle is its per-group rank window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# Hex-prefix thresholds on md5(doc_id): first two hex chars are uniform
# over 256 values; 'cd' = 205/256 ≈ 80%, 'e6' = 230/256 ≈ 90%. String
# comparison of lowercase hex is order-identical in Spark and DuckDB.
_TRAIN_HI = "cd"
_VAL_HI = "e6"


@register(
    "llm_split_train_test",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_TRAIN_HI}'
                  THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_VAL_HI}'
                  THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def llm_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test split by content-stable
    hash of the document id. Hash-based (never rand()): membership is a
    pure row function, so the split is reproducible across runs,
    engines, partitionings, and retries — the invariant training
    pipelines actually need. Zero shuffles: the assignment is a
    projection."""
    d = table(spark, sf_dir, "documents")
    b2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return d.select(
        "doc_id",
        F.when(b2 < _TRAIN_HI, "train")
        .when(b2 < _VAL_HI, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "llm_sample_stratified",
    oracle="""
    WITH ranked AS (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
      FROM documents
    ),
    target AS (SELECT MIN(cnt) AS t FROM (
      SELECT COUNT(*) AS cnt FROM documents GROUP BY lang))
    SELECT lang, doc_id FROM ranked, target WHERE rn <= t
    """,
)
def llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified class-balancing sample: keep the same number of docs
    per language (the size of the smallest class), chosen as the
    hash-smallest doc_ids so the sample is deterministic and stable
    under data growth within untouched classes. One shuffle (the
    per-class rank window); the class-size reduction is a broadcast
    scalar."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
    target = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.min("cnt").alias("t"))
    )
    return (
        ranked.crossJoin(F.broadcast(target))
        .filter(F.col("rn") <= F.col("t"))
        .select("lang", "doc_id")
    )


_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+"


@register(
    "llm_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                AS INT) AS n_digit_chars,
           substr(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<email>',
                                                'g'),
                                 '[0-9]+', '#', 'g'), 1, 80) AS scrub_prefix
    FROM documents
    """,
)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass (training-data hygiene): mask email addresses
    then collapse digit runs, reporting how many digit characters were
    present. All JVM-side regexp_replace — no Python in the row path;
    the regex dialect is restricted to the class/quantifier subset Spark
    (Java) and DuckDB (RE2) interpret identically."""
    d = table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<email>"), "[0-9]+", "#"
    )
    n_digits = F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
    return d.select(
        "doc_id",
        n_digits.cast("int").alias("n_digit_chars"),
        F.substring(scrubbed, 1, 80).alias("scrub_prefix"),
    )
