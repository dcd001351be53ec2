"""Corpus-curation operators for LLM training data: rule-based quality
filtering (Gopher-style), within-document repetition signals, and
benchmark decontamination — the filter stages that sit between raw
ingest and dedup in a production pipeline.

All three are tokenize → per-doc aggregate shapes: one explode pass over
the corpus, integer counting, exact double ratios (integer operands make
IEEE division bit-identical across engines — see oracle_compat notes).
No Python in the row path.

Scale design:
- Quality/repetition are embarrassingly parallel per document — the only
  shuffle is the per-doc_id aggregation, which partial-aggregates
  map-side because every signal is an algebraic count/sum/max.
- Decontamination joins the corpus n-gram stream against the DISTINCT
  benchmark n-gram set. Benchmark suites are tiny relative to a 100 TB
  corpus, so that set is broadcast (no shuffle of the corpus side); at
  extreme benchmark sizes swap the broadcast for a bloom-filter
  pre-screen plus an equi-join confirm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# Gopher-style rule thresholds (Rae et al. 2021 uses word-count, mean
# word length, and repetition bounds; constants here are tuned so each
# rule binds on the synthetic corpus — at these settings 225/500 docs
# pass at sf0.01).
_MIN_WORDS, _MAX_WORDS = 20, 90
_MIN_WLEN, _MAX_WLEN = 4.0, 5.0
_MIN_UNIQ = 0.4
_MAX_TOP = 0.12

# Benchmark split for decontamination: a pure function of doc_id so the
# "held-out benchmark" is stable across runs and engines.
_BENCH_MOD = 53


@register(
    "llm_gopher_quality",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    per_word AS (
      SELECT doc_id, tok, COUNT(*) AS c, len(tok) AS wlen
      FROM toks GROUP BY doc_id, tok
    ),
    sig AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_words,
             CAST(COUNT(*) AS BIGINT) AS n_unique,
             CAST(SUM(wlen * c) AS DOUBLE) / SUM(c) AS mean_word_len,
             CAST(COUNT(*) AS DOUBLE) / SUM(c) AS uniq_ratio,
             CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_word_ratio
      FROM per_word GROUP BY doc_id
    )
    SELECT doc_id, n_words, n_unique, mean_word_len, uniq_ratio,
           top_word_ratio,
           (n_words BETWEEN {_MIN_WORDS} AND {_MAX_WORDS}
            AND mean_word_len BETWEEN {_MIN_WLEN} AND {_MAX_WLEN}
            AND uniq_ratio >= {_MIN_UNIQ}
            AND top_word_ratio <= {_MAX_TOP}) AS keep
    FROM sig
    """,
)
def llm_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality filter: per-document word count,
    mean word length, unique-word ratio, and most-common-word dominance,
    plus the conjunctive keep flag.

    Every ratio is an exact IEEE division of two integers, so the
    doubles (and therefore the keep booleans) are bit-identical to the
    SQL oracle — no rounding, no epsilon.

    Scale: two-level agg (doc×word, then doc), both algebraic —
    map-side partial aggregation applies at each level; one shuffle
    keyed by doc_id."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    per_word = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("c"), F.max(F.length("tok")).alias("wlen")
    )
    n = F.sum("c")
    sig = per_word.groupBy("doc_id").agg(
        n.cast("bigint").alias("n_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_unique"),
        (F.sum(F.col("wlen") * F.col("c")).cast("double") / n).alias("mean_word_len"),
        (F.count(F.lit(1)).cast("double") / n).alias("uniq_ratio"),
        (F.max("c").cast("double") / n).alias("top_word_ratio"),
    )
    keep = (
        F.col("n_words").between(_MIN_WORDS, _MAX_WORDS)
        & F.col("mean_word_len").between(_MIN_WLEN, _MAX_WLEN)
        & (F.col("uniq_ratio") >= _MIN_UNIQ)
        & (F.col("top_word_ratio") <= _MAX_TOP)
    )
    return sig.select(
        "doc_id", "n_words", "n_unique", "mean_word_len", "uniq_ratio",
        "top_word_ratio", keep.alias("keep"),
    )


@register(
    "llm_repetition",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    uni AS (
      SELECT doc_id, COUNT(*) AS n1, COUNT(DISTINCT tok) AS u1
      FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
            FROM documents) GROUP BY doc_id
    ),
    bg AS (
      SELECT doc_id, l[i] || ' ' || l[i + 1] AS g
      FROM toks, LATERAL (SELECT UNNEST(range(1, len(l)))) t(i)
      WHERE len(l) >= 2
    ),
    b2 AS (SELECT doc_id, COUNT(*) AS n2, COUNT(DISTINCT g) AS u2
           FROM bg GROUP BY doc_id),
    tg AS (
      SELECT doc_id, l[i] || ' ' || l[i + 1] || ' ' || l[i + 2] AS g
      FROM toks, LATERAL (SELECT UNNEST(range(1, len(l) - 1))) t(i)
      WHERE len(l) >= 3
    ),
    b3 AS (SELECT doc_id, COUNT(*) AS n3, COUNT(DISTINCT g) AS u3
           FROM tg GROUP BY doc_id)
    SELECT uni.doc_id,
           1.0 - CAST(u1 AS DOUBLE) / n1 AS dup_word_frac,
           1.0 - CAST(u2 AS DOUBLE) / n2 AS dup_bigram_frac,
           1.0 - CAST(u3 AS DOUBLE) / n3 AS dup_trigram_frac
    FROM uni JOIN b2 USING (doc_id) JOIN b3 USING (doc_id)
    """,
)
def llm_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText
    repetition filters): duplicate word, bigram, and trigram fractions
    per document. High values flag boilerplate and degenerate text.

    The three n-gram streams come from ONE posexplode pass — bigrams and
    trigrams are lead(1)/lead(2) over the same per-doc window, so the
    corpus is scanned once and the window shuffle (by doc_id) is shared.
    Each fraction is 1 - distinct/total with integer operands: exact
    IEEE doubles, bit-identical to the oracle."""
    d = table(spark, sf_dir, "documents")
    # (r16 note: the slices+arrays_zip rewrite that removed the window
    # in llm_decontaminate / llm_bigram_fluency was A/B'd here too and
    # measured a wash — 1.03× over 6 interleaved pairs; the
    # countDistinct expand dominates this key, so the window shape
    # stays.)
    toks = d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w1"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = toks.select(
        "doc_id",
        "w1",
        F.lead("w1", 1).over(w).alias("w2"),
        F.lead("w1", 2).over(w).alias("w3"),
    )
    g2 = F.concat_ws(" ", "w1", "w2")
    g3 = F.concat_ws(" ", "w1", "w2", "w3")
    agg = grams.groupBy("doc_id").agg(
        F.count("w1").alias("n1"),
        F.countDistinct("w1").alias("u1"),
        F.count(F.when(F.col("w2").isNotNull(), 1)).alias("n2"),
        F.countDistinct(F.when(F.col("w2").isNotNull(), g2)).alias("u2"),
        F.count(F.when(F.col("w3").isNotNull(), 1)).alias("n3"),
        F.countDistinct(F.when(F.col("w3").isNotNull(), g3)).alias("u3"),
    )
    return agg.filter(F.col("n3") > 0).select(
        "doc_id",
        (F.lit(1.0) - F.col("u1").cast("double") / F.col("n1")).alias("dup_word_frac"),
        (F.lit(1.0) - F.col("u2").cast("double") / F.col("n2")).alias("dup_bigram_frac"),
        (F.lit(1.0) - F.col("u3").cast("double") / F.col("n3")).alias("dup_trigram_frac"),
    )


@register(
    "llm_decontaminate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    g AS (
      SELECT doc_id, l[i] || ' ' || l[i + 1] || ' ' || l[i + 2] AS gram
      FROM toks, LATERAL (SELECT UNNEST(range(1, len(l) - 1))) t(i)
      WHERE len(l) >= 3
    ),
    bench AS (
      SELECT DISTINCT gram FROM g WHERE doc_id % {_BENCH_MOD} = 0
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(*) FILTER (gram IN (SELECT gram FROM bench))
                AS BIGINT) AS n_hits,
           COUNT(*) FILTER (gram IN (SELECT gram FROM bench)) > 0
             AS contaminated
    FROM g WHERE doc_id % {_BENCH_MOD} <> 0
    GROUP BY g.doc_id
    """,
)
def llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM n-gram-overlap method):
    flag training documents sharing any word trigram with a held-out
    benchmark split (docs with doc_id % 53 == 0 stand in for the eval
    suite). Returns per-doc gram counts, hit counts, and the
    contaminated flag.

    Scale: the benchmark gram set is DISTINCT'd and broadcast — the
    100 TB training side streams past it with no shuffle; membership is
    a broadcast-hash lookup. Real pipelines at extreme benchmark sizes
    put a bloom filter in front; the join shape is unchanged."""
    d = table(spark, sf_dir, "documents")
    # r16: full trigrams from three aligned slices + arrays_zip — no
    # per-doc window sort (guide §2.4); the n >= 3 filter replaces the
    # old lead(2)-isNotNull trailing-row drop.
    # r17: the trigram never becomes a string — the slice columns hash
    # straight to a LONG id (the llm_dedup_ngram / char_kgram_ids
    # move): the gram only feeds the broadcast membership lookup and
    # counting, so the concat_ws re-assembly disappears and the
    # benchmark set broadcasts 8-byte ids instead of 3-word strings
    # (words carry no spaces → the triple decomposition is unique;
    # collision bound as in char_kgram_ids).
    d2 = d.select("doc_id", F.split("text", " ").alias("ws"))
    n = F.size("ws")
    grams = (
        d2.filter(n >= 3)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("ws", F.lit(1), n - 2).alias("w1"),
                    F.slice("ws", F.lit(2), n - 2).alias("w2"),
                    F.slice("ws", F.lit(3), n - 2).alias("w3"),
                )
            ).alias("t"),
        )
        .select(
            "doc_id",
            F.xxhash64("t.w1", "t.w2", "t.w3").alias("gram"),
        )
    )
    bench = (
        grams.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select("gram")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = grams.filter(F.col("doc_id") % _BENCH_MOD != 0)
    joined = train.join(F.broadcast(bench), "gram", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.count("hit").cast("bigint").alias("n_hits"),
        (F.count("hit") > 0).alias("contaminated"),
    )


@register(
    "llm_repeated_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    g AS (
      SELECT doc_id,
             l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
               || ' ' || l[i+4] AS span
      FROM toks, LATERAL (SELECT UNNEST(range(1, len(l) - 3))) t(i)
      WHERE len(l) >= 5
    )
    SELECT span,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM g
    GROUP BY span
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def llm_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide repeated-span mining (the relational core of
    suffix-array substring dedup, Lee et al. 2022): every 5-token span
    occurring in 2+ DISTINCT documents, with occurrence and document
    counts — the catalog from which cross-document boilerplate is cut.
    Differs from llm_decontaminate (overlap vs a fixed benchmark set):
    this is all-vs-all within the corpus.

    Scale: one posexplode + lead chain builds the span stream in place;
    the only shuffle is the groupBy on the span string (map-side
    partials apply to both counts — COUNT(DISTINCT doc) expands once).
    A true suffix array finds arbitrary-length repeats; fixed-width
    spans are the standard scalable approximation (run with several
    widths in production)."""
    from .dedup import word_kgrams

    d = table(spark, sf_dir, "documents")
    # the gram-window construction is shared with llm_dedup_exact_substr
    # (dedup.word_kgrams) — one definition of tokenization + boundary
    spans = word_kgrams(d, 5).select("doc_id", F.col("g").alias("span"))
    return (
        spans.groupBy("span")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 2)
    )
