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


@register(
    "llm_sampling_weights",
    oracle="""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(n_docs) AS total, COUNT(*) AS n_sources FROM counts)
    SELECT c.source, c.n_docs,
           CAST(FLOOR(1000000.0 * t.total / (t.n_sources * c.n_docs))
                AS BIGINT) AS weight_e6
    FROM counts c CROSS JOIN tot t
    """,
)
def llm_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency epoch sampling weights per source — the 'data
    recipe' counterpart to llm_dataset_mix's hash-sampling: weight_e6 =
    1e6 · N_total / (n_sources · n_source), i.e. the multiplier that
    equalizes every source's expected contribution per epoch
    (upweights rare domains, downweights dominant ones — the standard
    temperature-1 balancing step before training).

    Exactness: counts are integers; 1e6·total < 2^53 so the double
    division is computed on exactly-represented operands and FLOOR is
    deterministic in both engines. Scale: one map-side-combinable count
    per source, then a scalar broadcast (the totals row) — no data-sized
    shuffle beyond the count itself."""
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").alias("total"), F.count(F.lit(1)).alias("n_sources")
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.floor(
            F.lit(1000000.0) * F.col("total") / (F.col("n_sources") * F.col("n_docs"))
        )
        .cast("bigint")
        .alias("weight_e6"),
    )


@register(
    "llm_curriculum_stages",
    oracle="""
    WITH cuts AS (
      SELECT quantile_cont(n_chars, 0.25) AS q1,
             quantile_cont(n_chars, 0.50) AS q2,
             quantile_cont(n_chars, 0.75) AS q3
      FROM documents
    ),
    staged AS (
      SELECT d.doc_id, d.lang, d.n_chars,
             1 + CASE WHEN d.n_chars > c.q1 THEN 1 ELSE 0 END
               + CASE WHEN d.n_chars > c.q2 THEN 1 ELSE 0 END
               + CASE WHEN d.n_chars > c.q3 THEN 1 ELSE 0 END AS stage
      FROM documents d CROSS JOIN cuts c
    )
    SELECT stage, COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
           COUNT(DISTINCT lang) AS n_langs
    FROM staged GROUP BY stage
    """,
)
def llm_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum bucketing: assign each document to one of 4 difficulty
    stages by exact length quartiles (short→long is the classic
    easy→hard axis), report per-stage composition. Deliberately NOT a
    global NTILE — a single-partition window over every row is the
    anti-pattern at 100 TB. Instead: ONE aggregate computes the three
    cut points (exact interpolated percentiles, identical definition in
    Spark `percentile` and DuckDB `quantile_cont`), broadcast as a
    scalar row, and stage assignment is a row-local comparison — the
    same two-phase shape a production pipeline uses (cuts from a sample
    or sketch, then a map-only pass).

    Exactness: n_chars is integer; the interpolated quartile is
    (a + (b-a)·frac) on exactly-represented ints with dyadic fracs —
    bit-identical across engines; boundary comparisons are int-vs-exact-
    double."""
    d = table(spark, sf_dir, "documents")
    cuts = d.agg(
        F.expr("percentile(n_chars, 0.25)").alias("q1"),
        F.expr("percentile(n_chars, 0.50)").alias("q2"),
        F.expr("percentile(n_chars, 0.75)").alias("q3"),
    )
    staged = d.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "lang",
        "n_chars",
        (
            F.lit(1)
            + (F.col("n_chars") > F.col("q1")).cast("int")
            + (F.col("n_chars") > F.col("q2")).cast("int")
            + (F.col("n_chars") > F.col("q3")).cast("int")
        ).alias("stage"),
    )
    return staged.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
