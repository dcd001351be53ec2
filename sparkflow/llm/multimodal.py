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


_FRAME = 64  # bytes per fake "frame"
_STRIDE = 4  # sample every 4th frame


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        doc_ids, idxs, lens, sums = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = len(payload) // _FRAME
            for fi in range(0, n_frames, _STRIDE):
                block = payload[fi * _FRAME : (fi + 1) * _FRAME]
                doc_ids.append(doc_id)
                idxs.append(fi)
                lens.append(len(block))
                sums.append(int(sum(block)))
        yield pd.DataFrame(
            {
                "doc_id": doc_ids,
                "frame_idx": idxs,
                "frame_len": lens,
                "frame_checksum": sums,
            }
        )


@register(
    "llm_multimodal_frames",
    oracle=f"""
    WITH frames AS (
      SELECT doc_id, text,
             UNNEST(range(0, len(text) // {_FRAME}, {_STRIDE})) AS frame_idx
      FROM documents
    )
    SELECT f.doc_id, f.frame_idx,
           {_FRAME} AS frame_len,
           CAST(SUM(ascii(substr(f.text, f.frame_idx * {_FRAME} + i, 1))) AS BIGINT)
             AS frame_checksum
    FROM frames f, LATERAL (SELECT UNNEST(range(1, {_FRAME} + 1))) t(i)
    GROUP BY f.doc_id, f.frame_idx
    """,
)
def llm_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video-like binary payloads (task brief): slice
    the payload into fixed-size frames, keep every 4th, emit one row per
    sampled frame with a checksum. The decode is a STUB (byte windows
    stand in for decoded frames — no codecs in this container) but the
    Spark shape is the real thing: mapInPandas producing MULTIPLE output
    rows per input row over Arrow, schema'd and partition-preserving.
    ASCII corpus ⇒ byte values == character codes, so the oracle can
    recompute checksums relationally."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(
        _sample_frames,
        schema="doc_id BIGINT, frame_idx INT, frame_len INT, frame_checksum BIGINT",
    )


_THUMB = 32  # fake thumbnail edge: first _THUMB*_THUMB payload bytes


def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    n = _THUMB * _THUMB
    for pdf in batches:
        payloads = pdf["payload"]
        thumbs = [p[:n] for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "thumb_w": [_THUMB] * len(payloads),
                "thumb_h": [_THUMB] * len(payloads),
                "thumb_bytes": [len(t) for t in thumbs],
                "thumb_checksum": [int(sum(t)) for t in thumbs],
            }
        )


@register(
    "llm_multimodal_resize",
    oracle=f"""
    SELECT doc_id,
           {_THUMB} AS thumb_w, {_THUMB} AS thumb_h,
           CAST(LEAST(octet_length(encode(text)), {_THUMB * _THUMB}) AS INT)
             AS thumb_bytes,
           CAST((SELECT COALESCE(SUM(ascii(substr(text, i, 1))), 0)
                 FROM UNNEST(range(1, LEAST(len(text), {_THUMB * _THUMB}) + 1)) t(i))
                AS BIGINT) AS thumb_checksum
    FROM documents
    """,
)
def llm_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize step of the multimodal pipeline (task brief): produce a
    fixed-size "thumbnail" per binary payload. The DECODE+RESAMPLE is a
    STUB (no codecs in this container: the thumbnail is the payload's
    leading {32x32} bytes, SQL-recomputable so the plumbing is
    oracle-verified) — swapping in PIL `Image.resize` changes only
    `_resize`'s body; the mapInPandas signature, Arrow batching, and
    fixed-size output schema are exactly what the real kernel needs."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(
        _resize,
        schema=(
            "doc_id BIGINT, thumb_w INT, thumb_h INT,"
            " thumb_bytes INT, thumb_checksum BIGINT"
        ),
    )
