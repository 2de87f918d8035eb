"""Scalar int8 embedding quantization — the storage-side play a 100 TB
vector corpus needs BEFORE any index: per-vector symmetric int8 codes
(q_i = round(x_i / s), s = max|x| / 127) cut the embedding column 4×
(plus one float scale per row) while cosine survives EXACTLY in the
code space — the per-vector scales cancel:

    cos(a, b) = (sa·sb·Σ qa_i qb_i) / (sa·|qa| · sb·|qb|)
              = Σ qa_i qb_i / (|qa|·|qb|)

so ``cosine_topk_int8`` ranks on INTEGER dot products and integer
norms — deterministic across engines by construction (no float
reduction-order anywhere until one final division), which is why its
DuckDB oracle matches value-for-value rather than to a rounding band.
This is the faiss ``SQ8``/vector-DB scalar-quantization shape, as PQ
(similarity/pq.py) is the product-quantization one; the reference ships
the float brute-force search (python/cuml/neighbors/
nearest_neighbors.pyx) but no compression tier.

Spark shapes (100 TB): quantization is MAP-ONLY — one in-row
``aggregate`` for max|x|, one ``transform`` for the codes, zero
shuffle, so it fuses into whatever scan writes the compressed table.
Search joins the (tiny) quantized query set against the quantized
corpus exactly like cosine_topk: broadcast queries, per-partition
partial top-k via the rank window (WindowGroupLimit ≤k rows per query
past the shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine_topk_int8", "dequantize_int8", "hamming_topk_bits",
           "quantize_int8", "sign_quantize"]


def _maxabs(v: Column) -> Column:
    return F.aggregate(
        v, F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))))


def quantize_int8(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """→ (id_col, qvec array<tinyint>, scale double): symmetric int8
    codes with per-vector scale = max|x|/127 (an all-zero vector keeps
    scale 0 and an all-zero code).  Map-only, zero shuffle."""
    v = F.col(vec_col).cast("array<double>")
    scale = _maxabs(v) / F.lit(127.0)
    q = F.when(
        scale > 0,
        F.transform(v, lambda x: F.round(x / scale).cast("tinyint")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return df.select(
        F.col(id_col), q.alias("qvec"), scale.alias("scale"))


def dequantize_int8(
    df: DataFrame,
    *,
    qvec_col: str = "qvec",
    scale_col: str = "scale",
    id_col: str = "vec_id",
    out_col: str = "embedding",
) -> DataFrame:
    """Inverse map: code·scale → approximate float vector (map-only)."""
    out = F.transform(
        F.col(qvec_col),
        lambda q: q.cast("double") * F.col(scale_col))
    return df.select(F.col(id_col), out.alias(out_col))


def sign_quantize(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """→ (id_col, words array<long>): 1-BIT quantization — bit j of
    word w is set iff ``x[32w + j] > 0`` (32 sign bits per word, so
    every word value stays well inside a signed 64-bit long and the
    packing is plain exact integer arithmetic any engine reproduces).
    32× smaller than float32; map-only, zero shuffle.  The Hamming
    distance between two codes is the classic angular-similarity proxy
    (random-hyperplane LSH with axis-aligned planes)."""
    v = F.col(vec_col).cast("array<double>")
    nwords = (F.size(v) + F.lit(31)) / F.lit(32)
    words = F.transform(
        F.sequence(F.lit(0), nwords.cast("int") - 1),
        lambda w: F.aggregate(
            F.zip_with(
                F.slice(v, w * 32 + 1, 32),
                F.sequence(F.lit(0), F.lit(31)),
                # 2^j via pow (exact in double through 2^31, then cast)
                # — F.shiftleft requires a literal python int shift
                lambda x, j: F.when(
                    x > 0,
                    F.pow(F.lit(2.0), j.cast("double")).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"), lambda acc, b: acc + b,
        ),
    )
    return df.select(F.col(id_col), words.alias("words"))


def hamming_topk_bits(
    index: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    vec_col: str = "embedding",
    index_id: str = "vec_id",
    query_id: str = "vec_id",
) -> DataFrame:
    """Brute-force Hamming top-k over sign codes →
    (query_id, neighbor_id, hamming, rank), nearest first.

    Distance = Σ popcount(word_a XOR word_b) — EXACT integers end to
    end, so ranking (ties to the smaller neighbor id) is reproducible
    on any partitioning and in any engine, with no rounding anywhere.
    The broadcast-queries / WindowGroupLimit plan of cosine_topk."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    qi = sign_quantize(index, vec_col=vec_col, id_col=index_id).select(
        F.col(index_id).alias("neighbor_id"), F.col("words").alias("__iw"))
    qq = sign_quantize(queries, vec_col=vec_col, id_col=query_id).select(
        F.col(query_id).alias("query_id"), F.col("words").alias("__qw"))
    ham = F.aggregate(
        F.zip_with(F.col("__iw"), F.col("__qw"),
                   lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    scored = (
        qi.crossJoin(F.broadcast(qq))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", ham.alias("hamming"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def _int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def cosine_topk_int8(
    index: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    vec_col: str = "embedding",
    index_id: str = "vec_id",
    query_id: str = "vec_id",
    round_to: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k in int8 code space →
    (query_id, neighbor_id, cos_sim, rank), most-similar first.

    Both sides quantize in-row; similarity = int dot / (√int·√int) —
    the numerator and both squared norms are exact 64-bit integers, so
    ranking (on the rounded similarity, ties to the smaller neighbor
    id) is reproducible on any partitioning and in any engine.  Rows
    with zero-norm codes never match (similarity NULL → filtered)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # squared norms fold PER SIDE before the join — each pair then pays
    # one integer dot, not three (the n_index × n_query blowup is where
    # redundant per-pair work actually costs)
    qi = quantize_int8(index, vec_col=vec_col, id_col=index_id).select(
        F.col(index_id).alias("neighbor_id"), F.col("qvec").alias("__iv"),
    ).withColumn("__n2a", _int_dot(F.col("__iv"), F.col("__iv")))
    qq = quantize_int8(queries, vec_col=vec_col, id_col=query_id).select(
        F.col(query_id).alias("query_id"), F.col("qvec").alias("__qv"),
    ).withColumn("__n2b", _int_dot(F.col("__qv"), F.col("__qv")))
    pairs = qi.crossJoin(F.broadcast(qq))
    dot = _int_dot(F.col("__iv"), F.col("__qv"))
    n2a, n2b = F.col("__n2a"), F.col("__n2b")
    sim = F.when(
        (n2a > 0) & (n2b > 0),
        dot.cast("double") / (F.sqrt(n2a.cast("double"))
                              * F.sqrt(n2b.cast("double"))),
    )
    scored = pairs.select(
        "query_id", "neighbor_id",
        F.round(sim, round_to).alias("cos_sim"),
    ).where(F.col("cos_sim").isNotNull()
            & (F.col("query_id") != F.col("neighbor_id")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )
