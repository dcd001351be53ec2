"""Training-batch preparation operators: chunking (RAG/window split),
dataset mixing (per-source rates), embedding quantization (int8), and
sequence packing — the stages that turn a curated corpus into model
input at 100 TB.

All four are pure column algebra over one scan; the only shuffles are
per-shard windows (packing) and per-doc aggregation. Ratios/rounding use
floor(x + 0.5) / integer fixed-point so every value is bit-identical to
the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_CHUNK, _STRIDE = 32, 16

# Per-source sampling rates for the training mix: src0 keeps 95%,
# descending 3.75 points per source index. Thresholds are 4-hex-char
# prefixes of md5(doc_id || source) — uniform over 65536, compared as
# strings (order-identical lowercase hex in both engines).
_MIX_RATES = {f"src{i}": 0.95 - 0.0375 * i for i in range(20)}
_MIX_THR = {s: format(int(r * 65536), "04x") for s, r in _MIX_RATES.items()}

_PACK_BIN = 512  # tokens per packed sequence


@register(
    "llm_chunking",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    )
    SELECT doc_id,
           CAST((i - 1) / {_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(LEAST(len(l) - i + 1, {_CHUNK}) AS BIGINT) AS chunk_tokens,
           array_to_string(l[i : i + {_CHUNK - 1}], ' ') AS chunk_text
    FROM toks, LATERAL (
      SELECT UNNEST(range(1, len(l) + 1, {_STRIDE}))
    ) t(i)
    """,
)
def llm_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking (the RAG / long-context
    split): 32-token chunks every 16 tokens, each with its index, token
    count, and text. The trailing chunk is allowed short — exactly the
    policy of sliding-window tokenizer chunkers.

    Scale: split once, explode the stride-16 start positions, and
    `slice` the token array JVM-side — no re-tokenization per chunk and
    no Python. Output is ~(n_tokens/16) rows per doc, generated in one
    narrow (shuffle-free) pass."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("l"))
    starts = toks.select(
        "doc_id",
        "l",
        F.explode(
            F.sequence(F.lit(1), F.size("l"), F.lit(_STRIDE))
        ).alias("i"),
    )
    return starts.select(
        "doc_id",
        (((F.col("i") - 1) / _STRIDE).cast("bigint")).alias("chunk_idx"),
        F.least(F.size("l") - F.col("i") + 1, F.lit(_CHUNK))
        .cast("bigint")
        .alias("chunk_tokens"),
        F.array_join(F.slice(F.col("l"), F.col("i"), _CHUNK), " ").alias("chunk_text"),
    )


def _mix_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN '{t}'" for s, t in sorted(_MIX_THR.items())
    )
    return f"CASE source {whens} END"


@register(
    "llm_dataset_mix",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (
             substr(md5(CAST(doc_id AS VARCHAR) || source), 1, 4)
               < {_mix_case_sql()}
           ) AS BIGINT) AS n_kept
    FROM documents GROUP BY source
    """,
)
def llm_dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixing (per-domain sampling rates, the
    'data recipe' stage): each source keeps a configured fraction of its
    documents, membership decided by a hash of (doc_id, source) — a pure
    row function, so the mix is reproducible on any cluster size, and
    resuming a partially-written epoch never re-draws the sample.
    Returns per-source totals and kept counts.

    Scale: no shuffle for the decision (row-local hash compare); one
    map-side-combinable aggregation for the report."""
    d = table(spark, sf_dir, "documents")
    thr = F.create_map(
        *[F.lit(x) for kv in sorted(_MIX_THR.items()) for x in kv]
    )[F.col("source")]
    h = F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.col("source"))), 1, 4)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.count_if(h < thr).cast("bigint").alias("n_kept"),
    )


@register(
    "llm_embedding_quantize",
    oracle="""
    WITH dims AS (
      SELECT vec_id, d AS dim,
             CAST(embedding[d + 1] AS DOUBLE) AS x
      FROM embeddings, LATERAL (
        SELECT UNNEST(range(0, len(embedding)))
      ) t(d)
    ),
    scaled AS (
      SELECT vec_id, MAX(ABS(x)) AS maxabs FROM dims GROUP BY vec_id
    )
    SELECT dims.vec_id, CAST(dim AS BIGINT) AS dim,
           CAST(FLOOR(x * 127.0 / maxabs + 0.5) AS BIGINT) AS q
    FROM dims JOIN scaled ON dims.vec_id = scaled.vec_id
    """,
)
def llm_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column — the
    storage/bandwidth path of a 100 TB vector store (4× smaller than
    float32, dot products in integer SIMD). Per-vector scale =
    max(|x|); q = floor(x·127/scale + 0.5) ∈ [-127, 127].

    floor(x + 0.5) instead of round(): round() tie-breaks differently
    across engines on binary-exact halves (x = scale/2 hits one);
    floor-plus-half is HALF_UP in both. float32 → double widening is
    exact, so the quantized integers are bit-identical to the oracle.

    Scale shape: posexplode + per-vec_id max + rejoin — two narrow
    shuffles on vec_id; no Python, no UDF."""
    e = table(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("dim", "xf")
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    scale = dims.groupBy("vec_id").agg(F.max(F.abs("x")).alias("maxabs"))
    return dims.join(scale, "vec_id").select(
        "vec_id",
        F.col("dim").cast("bigint").alias("dim"),
        F.floor(F.col("x") * 127.0 / F.col("maxabs") + 0.5)
        .cast("bigint")
        .alias("q"),
    )


@register(
    "llm_packed_sequences",
    oracle=f"""
    WITH counted AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    offs AS (
      SELECT doc_id, source, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS tok_offset
      FROM counted
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens, tok_offset,
           CAST(tok_offset // {_PACK_BIN} AS BIGINT) AS bin_id
    FROM offs
    """,
)
def llm_packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (streaming-fill): concatenate each shard's
    documents in doc_id order and cut the token stream into 512-token
    bins; every doc gets its stream offset and the bin where it starts.
    This is the packing stage that keeps training batches dense instead
    of padding each doc to max length.

    Scale: packing is PER SHARD (partition by source) — the running-sum
    window shuffles once on source and never forms a global order. A
    single global cumsum would serialize the corpus through one task;
    per-shard packing is how real pipelines stay parallel, at the cost
    of at most one ragged bin per shard boundary."""
    d = table(spark, sf_dir, "documents")
    counted = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counted.withColumn(
        "tok_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    )
    return offs.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "tok_offset",
        (F.col("tok_offset") / _PACK_BIN).cast("bigint").alias("bin_id"),
    )


# deterministic mask selector: pure integer arithmetic, identical text in
# both engines (no engine hash functions, whose seeds differ)
_MASK = "((((doc_id * 131 + pos) % 1000003) * 2654435761) % 97) < 15"


@register(
    "llm_span_corruption",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, CAST(pos AS BIGINT) - 1 AS pos, tok
      FROM (SELECT doc_id,
                   UNNEST(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM documents) t
    ),
    flagged AS (
      SELECT doc_id, pos, tok, {_MASK} AS m
      FROM toks
    ),
    runs AS (
      SELECT doc_id, pos, tok, m,
             COALESCE(LAG(m) OVER (PARTITION BY doc_id ORDER BY pos),
                      FALSE) AS prev_m
      FROM flagged
    )
    SELECT doc_id,
           STRING_AGG(CASE WHEN NOT m THEN tok
                           WHEN NOT prev_m THEN '<X>' END, ' ' ORDER BY pos)
             AS corrupted_text,
           STRING_AGG(CASE WHEN m THEN tok END, ' ' ORDER BY pos)
             AS target_text,
           CAST(COUNT(*) FILTER (m) AS BIGINT) AS n_masked
    FROM runs GROUP BY doc_id
    """,
)
def llm_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption prep: ~15% of tokens are masked by a
    DETERMINISTIC arithmetic selector (pure modular integer math — no
    engine hash whose seed differs), consecutive masked runs collapse
    to a single `<X>` sentinel in the corrupted text, and the masked
    tokens stream into the target side in order. This is the denoising-
    objective data layout (corrupted input → span targets).

    Scale: tokenize-explode, one lag window and one ordered-aggregate
    per doc — everything partitions by doc_id; output is corpus-sized,
    never wider than the input."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")
    flagged = toks.withColumn("m", F.expr(_MASK))
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = flagged.withColumn(
        "prev_m", F.coalesce(F.lag("m").over(w), F.lit(False))
    )
    piece = (
        F.when(~F.col("m"), F.col("tok"))
        .when(~F.col("prev_m"), F.lit("<X>"))
        .otherwise(F.lit(None))
    )
    tgt = F.when(F.col("m"), F.col("tok"))

    def ordered_join(col):
        return F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(col.isNotNull(), F.struct(F.col("pos"), col.alias("p")))
                    )
                ),
                lambda x: x["p"],
            ),
            " ",
        )

    return runs.groupBy("doc_id").agg(
        ordered_join(piece).alias("corrupted_text"),
        ordered_join(tgt).alias("target_text"),
        F.count(F.when(F.col("m"), 1)).cast("bigint").alias("n_masked"),
    )
