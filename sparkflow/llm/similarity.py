"""Similarity search over the embedding column (SURVEY §2.11).

- llm_knn_cosine: brute-force top-k against a fixed query vector — the
  correctness baseline. Dot products/norms are sequential left-to-right
  double folds (F.aggregate / DuckDB list_aggregate), so both engines
  produce bit-identical cosines.
- llm_knn_all_pairs_lsh: the scale path — random-hyperplane LSH buckets
  (multiple tables) + in-bucket exact cosine. The only join is on bucket
  signature; no O(n²) cross join ever materializes. Projections are
  deterministic rational constants (integer arithmetic → double), so the
  bucketing is reproducible everywhere; pytest asserts recall vs brute
  force.
- llm_centroids: per-label centroid + dispersion via posexplode +
  (label, dim) aggregation — embarrassingly parallel, no vector ever
  assembled on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_QUERY_VEC_ID = 0  # deterministic query: the embedding of vec_id 0
_TOP_K = 10

# Deterministic rational projection matrix for hyperplane LSH:
# proj[t][b][d] = ((2654435761 * (t*1000 + b*64 + d)) % 2001 - 1000) / 1000
# (Knuth multiplicative hash → uniform in [-1, 1], exact same double in
# any engine since it's integer arithmetic then one division.)
_N_TABLES = 4
_N_BITS = 4
_DIM = 64


def _proj(t: int, b: int, d: int) -> float:
    return ((2654435761 * (t * 1000 + b * 64 + d)) % 2001 - 1000) / 1000.0


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]), 'sum')"
    )


@register(
    "llm_knn_cosine",
    oracle=f"""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}
    ),
    scored AS (
      SELECT vec_id, label,
             ROUND(
               {_dot_sql('embedding::DOUBLE[]', 'qv')}
               / (sqrt({_dot_sql('embedding::DOUBLE[]', 'embedding::DOUBLE[]')})
                  * sqrt({_dot_sql('qv', 'qv')})), 9) AS cos_sim
      FROM embeddings, q
      WHERE vec_id <> {_QUERY_VEC_ID}
    )
    SELECT vec_id, label, cos_sim FROM scored
    ORDER BY cos_sim DESC, vec_id LIMIT {_TOP_K}
    """,
)
def llm_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for one query vector. Both engines fold
    left-to-right in double, same association → bit-exact scores; rounded
    to 9dp before the ORDER BY so the top-k cut is engine-stable."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("qv")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    ev = F.transform("embedding", lambda x: x.cast("double"))
    cos = F.round(
        dot(ev, F.col("qv"))
        / (F.sqrt(dot(ev, ev)) * F.sqrt(dot(F.col("qv"), F.col("qv")))),
        9,
    )
    return (
        e.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(_TOP_K)
    )


@register("llm_knn_all_pairs_lsh")  # rows-only: pytest asserts recall vs brute force
def llm_knn_all_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: 4 tables × 4-bit sign signatures.
    Candidates = pairs sharing any table's bucket; exact cosine inside
    buckets; per-vector best neighbor kept. The bucket join is the only
    pairwise step — at 100 TB you tune tables/bits so buckets stay
    O(100) rows; everything else is linear. Rows-only check: the
    candidate set is bucketing-dependent; pytest asserts recall vs
    brute force instead of a SQL oracle."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )

    def bucket(t: int):
        bits = []
        for b in range(_N_BITS):
            proj = F.array(*[F.lit(_proj(t, b, d)) for d in range(_DIM)])
            dot = F.aggregate(
                F.zip_with("v", proj, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(dot >= 0, F.lit(1 << b)).otherwise(F.lit(0)))
        code = bits[0]
        for x in bits[1:]:
            code = code + x
        return (F.lit(t * 100) + code).alias("bucket")

    buckets = None
    for t in range(_N_TABLES):
        piece = e.select("vec_id", "v", bucket(t))
        buckets = piece if buckets is None else buckets.unionByName(piece)

    a = buckets.select(
        F.col("vec_id").alias("va"), F.col("v").alias("xa"), "bucket"
    )
    b = buckets.select(
        F.col("vec_id").alias("vb"), F.col("v").alias("xb"), "bucket"
    )
    dot = F.aggregate(
        F.zip_with("xa", "xb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(
        F.aggregate(
            F.zip_with("xa", "xa", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.zip_with("xb", "xb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    pairs = (
        a.join(b, ["bucket"])
        .filter(F.col("va") < F.col("vb"))
        .select("va", "vb", (dot / (na * nb)).alias("cos_sim"))
        .groupBy("va", "vb")
        .agg(F.first("cos_sim").alias("cos_sim"))  # dedup multi-table hits
    )
    # symmetrize, keep each vector's best neighbor
    sym = pairs.unionByName(
        pairs.select(
            F.col("vb").alias("va"), F.col("va").alias("vb"), "cos_sim"
        )
    )
    best = sym.groupBy("va").agg(
        F.max_by("vb", F.struct(F.col("cos_sim"), (-F.col("vb")).alias("tb"))).alias(
            "neighbor_id"
        ),
        F.round(F.max("cos_sim"), 9).alias("cos_sim"),
    )
    return best.select(F.col("va").alias("vec_id"), "neighbor_id", "cos_sim")


@register(
    "llm_centroids",
    oracle="""
    WITH flat AS (
      SELECT label, vec_id,
             UNNEST(embedding::DOUBLE[]) AS val,
             UNNEST(range(0, 64)) AS dim
      FROM embeddings
    ),
    cent AS (
      SELECT label, dim, SUM(val) / COUNT(*) AS c
      FROM flat GROUP BY label, dim
    ),
    dists AS (
      SELECT f.label, f.vec_id, sqrt(SUM((f.val - c.c) * (f.val - c.c))) AS d
      FROM flat f JOIN cent c ON f.label = c.label AND f.dim = c.dim
      GROUP BY f.label, f.vec_id
    )
    SELECT d.label,
           COUNT(*) AS n_vecs,
           ROUND(SUM(d.d) / COUNT(*), 6) AS avg_dist,
           ROUND((SELECT sqrt(SUM(c.c * c.c)) FROM cent c
                  WHERE c.label = d.label), 6) AS centroid_norm
    FROM dists d GROUP BY d.label
    """,
)
def llm_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norm + mean distance-to-centroid. posexplode →
    (label, dim) partial aggregation — the distributed way to average
    vectors (never collect, never assemble on one node). Rounded: the
    grouped double sums are order-dependent at the 1e-15 level."""
    e = table(spark, sf_dir, "embeddings")
    flat = e.select(
        "label",
        "vec_id",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "dim", "val"
        ),
    )
    cent = flat.groupBy("label", "dim").agg(
        (F.sum("val") / F.count(F.lit(1))).alias("c")
    )
    dists = (
        flat.join(cent, ["label", "dim"])
        .groupBy("label", "vec_id")
        .agg(F.sqrt(F.sum((F.col("val") - F.col("c")) * (F.col("val") - F.col("c")))).alias("d"))
    )
    norms = cent.groupBy("label").agg(
        F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6).alias("centroid_norm")
    )
    return (
        dists.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.sum("d") / F.count(F.lit(1)), 6).alias("avg_dist"),
        )
        .join(norms, "label")
        .select("label", "n_vecs", "avg_dist", "centroid_norm")
    )


@register(
    "llm_dedup_embedding",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 100000 AS vec_id, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id % 10 = 0
    ),
    cand AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.v AS va, b.v AS vb
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) > 0.98  -- loose prefilter only
    )
    SELECT vec_a, vec_b,
           ROUND(
             {_dot_sql('va', 'vb')}
             / (sqrt({_dot_sql('va', 'va')}) * sqrt({_dot_sql('vb', 'vb')})),
             6) AS cos_sim
    FROM cand
    WHERE ROUND({_dot_sql('va', 'vb')}
             / (sqrt({_dot_sql('va', 'va')}) * sqrt({_dot_sql('vb', 'vb')})),
             6) >= 0.99
    """,
)
def llm_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.99). The corpus
    gets deterministic duplicate vectors injected (exact copies at
    vec_id+100000 for every 10th id — the natural max cosine in this
    data is ~0.51, so only injected dups cross the threshold and the LSH
    candidate set provably contains them: identical vectors share every
    bucket).

    Scale shape: hyperplane-LSH bucket join proposes candidates (the
    oracle's O(n²) cross join is the sf0.01-only referee, never the
    plan); exact cosine confirms. This is the embedding-dedup stage of a
    training-data pipeline."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    corpus = e.unionByName(
        e.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "v"
        )
    )

    def bucket(t: int):
        bits = []
        for b in range(8):
            proj = F.array(*[F.lit(_proj(t, b, d)) for d in range(_DIM)])
            dot = F.aggregate(
                F.zip_with("v", proj, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(dot >= 0, F.lit(1 << b)).otherwise(F.lit(0)))
        code = bits[0]
        for x in bits[1:]:
            code = code + x
        return (F.lit(t * 1000) + code).alias("bucket")

    buckets = None
    for t in range(2):
        piece = corpus.select("vec_id", "v", bucket(t))
        buckets = piece if buckets is None else buckets.unionByName(piece)

    a = buckets.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "bucket")
    b = buckets.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "bucket")

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, z: acc + z
        )

    cos = F.round(
        dot(F.col("va"), F.col("vb"))
        / (F.sqrt(dot(F.col("va"), F.col("va"))) * F.sqrt(dot(F.col("vb"), F.col("vb")))),
        6,
    )
    return (
        a.join(b, ["bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.99)
        .groupBy("vec_a", "vec_b")
        .agg(F.first("cos_sim").alias("cos_sim"))
    )


@register("llm_knn_ivf")  # rows-only: pytest asserts recall vs brute force
def llm_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse quantizer = per-label centroids (the label
    column stands in for a k-means codebook — same plan shape), probe
    the nprobe nearest cells, exact cosine only within them. At 100 TB
    the inverted lists are partition-pruned reads (cell id = partition
    key); the scan touches nprobe/k of the data. Rows-only check: ANN
    results are probe-set-dependent; pytest gates recall vs brute force
    instead of a SQL oracle."""
    nprobe = 3
    e = table(spark, sf_dir, "embeddings")
    flat = e.select(
        "label",
        "vec_id",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "dim", "val"
        ),
    )
    cent = flat.groupBy("label", "dim").agg(
        (F.sum("val") / F.count(F.lit(1))).alias("c")
    )
    q = e.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "dim", "qv"
        )
    )
    # centroid scores: sum over dims of c*qv / norms — tiny (k rows), all agg
    scored = (
        cent.join(F.broadcast(q), "dim")
        .groupBy("label")
        .agg(
            (
                F.sum(F.col("c") * F.col("qv"))
                / (
                    F.sqrt(F.sum(F.col("c") * F.col("c")))
                    * F.sqrt(F.sum(F.col("qv") * F.col("qv")))
                )
            ).alias("cell_score")
        )
        .orderBy(F.col("cell_score").desc(), "label")
        .limit(nprobe)
    )
    probe_labels = scored.select("label")

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    qvec = e.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("qv")
    )
    ev = F.transform("embedding", lambda x: x.cast("double"))
    cos = F.round(
        dot(ev, F.col("qv"))
        / (F.sqrt(dot(ev, ev)) * F.sqrt(dot(F.col("qv"), F.col("qv")))),
        9,
    )
    return (
        e.join(F.broadcast(probe_labels), "label")  # partition-pruned read at scale
        .filter(F.col("vec_id") != _QUERY_VEC_ID)
        .crossJoin(F.broadcast(qvec))
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(_TOP_K)
    )
