"""Shared replica-salting primitives for the scale generators.

tools/scale_smoke.py (10x, all tables) and tools/scale_ladder.py (100x,
documents/embeddings only) both synthesize N-replica corpora by
offsetting keys and decorrelating content per replica. The salting
SCHEME must be identical in both — the two tools drifted once (smoke
rolled embeddings by i, ladder by i % 64, silently duplicating replicas
>= 64) — so the scheme lives here and the generators only own their
writer strategy (concat-then-write vs streamed ParquetWriter).

Salt-design notes (measured, SCALE.md): per-token suffixes and Caesar
shifts leave char-shingle structure correlated across replicas; only a
seeded random ALPHABET PERMUTATION decorrelates text. For embeddings, a
rotation (np.roll) aliases once the shift passes the dimension count —
replica 64 of a 64-dim vector is replica 0 again — so replicas use a
seeded DIMENSION PERMUTATION instead (64! orderings, distinct for any
replica count, and value distributions are exactly preserved).
"""

from __future__ import annotations

import numpy as np

ALPHA = "abcdefghijklmnopqrstuvwxyz0123456789"


def salt_text(series, i: int):
    """Replica i's text: seeded alphabet permutation (identity at i=0)."""
    if i == 0:
        return series
    perm = np.random.RandomState(i).permutation(list(ALPHA))
    return series.str.translate(str.maketrans(ALPHA, "".join(perm)))


def salt_embedding(series, i: int):
    """Replica i's embeddings: seeded dimension permutation (identity at
    i=0). Unlike np.roll(v, i), distinct for any replica count."""
    if i == 0:
        return series
    first = np.asarray(series.iloc[0])
    perm = np.random.RandomState(1_000_000 + i).permutation(len(first))
    return series.map(lambda v: np.asarray(v)[perm].tolist())


def check_fits(series, stride: int, replicas: int, name: str) -> None:
    """Fail fast (with the actual numbers) when offset keys would
    overflow the SOURCE dtype — the replica tables are written back
    through the source schema, so an overflow would otherwise surface
    as an opaque safe-cast error at parquet write time."""
    dt = series.dtype
    if np.issubdtype(dt, np.integer):
        top = int(series.max()) + (replicas - 1) * stride
        lim = np.iinfo(dt).max
        assert top <= lim, (
            f"{name}: max offset key {top} exceeds source dtype {dt} "
            f"(max {lim}); regenerate testdata with int64 keys or lower "
            f"the replica count"
        )
