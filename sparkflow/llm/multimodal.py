"""Multimodal column plumbing (task brief: image/audio/video as opaque
binary columns + typed metadata, processed by Arrow-batched Python).

The container has no image/audio codecs, so the DECODE step is a
clearly-marked deterministic fake (`_fake_decode`) — but every piece of
Spark plumbing around it is real and tested: a binary column built
JVM-side, a mapInPandas feature extractor with an explicit output
schema, Arrow batch transfer, and a SQL-oracle on the deterministic
parts. Swapping `_fake_decode` for PIL/librosa is a one-function change.

Scale notes: mapInPandas streams Arrow batches — no per-row Python
calls, no collect; binary payloads stay columnar end to end. This is
the shape for 100 TB of image bytes: partition by file group, decode in
vectorized batches, never materialize on the driver.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_FEATURE_SCHEMA = (
    "doc_id BIGINT, n_bytes INT, first_byte INT, fake_width INT, fake_height INT"
)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB decoder (no codecs in this container): derives a deterministic
    fake (width, height) from the byte length. Replace with a real
    decoder (PIL.Image.open etc.) in production — the UDF signature,
    schema, and batching are already correct for that."""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        decoded = [_fake_decode(p) for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(p) for p in payloads],
                "first_byte": [p[0] if len(p) else -1 for p in payloads],
                "fake_width": [w for w, _ in decoded],
                "fake_height": [h for _, h in decoded],
            }
        )


@register(
    "llm_multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
           CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS fake_width,
           CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS fake_height
    FROM documents
    """,
)
def llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via mapInPandas: text bytes stand
    in for an image payload (the corpus is ASCII, so byte semantics are
    unambiguous); the fake decode is SQL-reproducible, which is what lets
    the Arrow plumbing be oracle-verified end to end."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(_extract_features, schema=_FEATURE_SCHEMA)
