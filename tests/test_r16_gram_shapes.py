"""Round-16 internals pin: the zipped-slice gram helpers are
row-identical to the naive shapes they replaced.

The r16 optimization rewrote the k-gram window construction (char and
word) from interpreted higher-order ``transform(sequence(...))`` /
``lead()``-window shapes to codegen-friendly zipped aligned slices.
The registered keys' DuckDB oracles pin end-to-end output, but this
test pins the HELPERS directly on a corpus built to hit the edges the
rewrite could plausibly break: docs shorter than k (must emit no
rows), docs of exactly k, line terminators inside the text (the (?s)
DOTALL split), repeated characters, multi-space token gaps, and
position numbering.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkflow.llm.dedup import char_kgrams, word_kgrams

CHAR_DOCS = [
    (1, "abcdefgh"),
    (2, "aaaaa"),
    (3, "ab"),  # shorter than every k tested: no rows
    (4, "line one\nline two\nthree"),  # \n must gram like any char
    (5, "exact"),  # length exactly 5
    (6, "tab\there and  double space"),
]

WORD_DOCS = [
    (1, "the quick brown fox jumps"),
    (2, "one two"),  # fewer tokens than k=3: no rows
    (3, "a a a a"),  # repeated tokens
    (4, "x  y z"),  # double space -> empty token, split(" ") keeps it
]


def _naive_char(df, k):
    return (
        df.filter(F.length("text") >= k)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.length("text") - (k - 1)),
                    lambda i: F.substring(F.col("text"), i, k),
                )
            ).alias("pos0", "g"),
        )
    )


def _naive_word(df, k):
    toks = df.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p", "w")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("p")
    cols = [F.col("w")] + [F.lead("w", i).over(w) for i in range(1, k)]
    return (
        toks.select(
            "doc_id",
            F.col("p").alias("pos"),
            F.concat_ws(" ", *cols).alias("g"),
            F.lead("w", k - 1).over(w).alias("last"),
        )
        .filter(F.col("last").isNotNull())
        .select("doc_id", "pos", "g")
    )


@pytest.mark.parametrize("k", [2, 5, 8])
def test_char_kgrams_matches_naive_shape(spark, k):
    df = spark.createDataFrame(CHAR_DOCS, ["doc_id", "text"])
    got = sorted(char_kgrams(df, k).collect())
    want = sorted(_naive_char(df, k).collect())
    assert got == want
    # a doc shorter than k emits nothing (sequence() would have descended)
    if k > 2:
        assert all(r.doc_id != 3 for r in got)
    # position is the 0-based window start
    one = {(r.pos0, r.g) for r in got if r.doc_id == 1}
    assert (0, "abcdefgh"[:k]) in one


@pytest.mark.parametrize("k", [2, 3])
def test_word_kgrams_matches_lead_window_shape(spark, k):
    df = spark.createDataFrame(WORD_DOCS, ["doc_id", "text"])
    got = sorted(word_kgrams(df, k).select("doc_id", "pos", "g").collect())
    want = sorted(_naive_word(df, k).collect())
    assert got == want
    if k > 2:
        assert all(r.doc_id != 2 for r in got)
