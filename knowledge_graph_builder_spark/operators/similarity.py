"""Similarity search over embedding columns (array<float>).

Two paths:

* brute-force cosine top-k — exact baseline. The dot product/norms are
  built-in higher-order functions (aggregate/zip_with), JVM-side; top-k
  is a window or orderBy+limit. O(n) per query vector.
* LSH-bucketed (random hyperplane signatures) — the scale path: each
  vector gets a b-bit sign signature from fixed pseudo-random
  hyperplanes; candidates share a signature bucket (multi-probe via
  bands), then exact cosine re-ranks within buckets. Hyperplanes are
  generated from a seeded hash — no driver-side randomness, no UDF.

An IVF variant would k-means the corpus; at 100 TB the hyperplane LSH is
preferred because it needs no training pass and its buckets shard evenly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_col(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm_col(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_col(a, b):
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector. Single scan + narrow
    top-k (Spark's orderBy+limit does a per-partition top-k then merges —
    no full sort at scale)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"),
        cosine_col(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from a seeded LCG —
    reproducible across sessions with no RNG state."""
    out = []
    state = (plane_idx * 2654435761 + 0x9E3779B9) & 0xFFFFFFFF
    for _ in range(dim):
        state = (state * 1664525 + 1013904223) & 0xFFFFFFFF
        out.append((state / 0xFFFFFFFF) * 2.0 - 1.0)
    return out


def signature_col(vec_col, dim: int, bits: int = 16):
    """b-bit random-hyperplane sign signature as a bit-string column."""
    parts = []
    for b in range(bits):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, b)])
        parts.append(F.when(dot_col(vec_col, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*parts)


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Approximate top-k: restrict the exact rerank to vectors sharing at
    least one signature band with the query, then cosine-sort."""
    dim = len(query_vec)
    vec = F.col(vec_col).cast("array<double>")
    signed = embeddings.select(
        F.col(id_col).alias("vec_id"), vec.alias("v"), signature_col(vec, dim, bits).alias("sig")
    )
    band_width = bits // bands

    # query signature computed driver-side with the same planes
    def _sign(vq):
        s = ""
        for b in range(bits):
            plane = _hyperplane(dim, b)
            s += "1" if sum(x * y for x, y in zip(vq, plane)) >= 0 else "0"
        return s

    qsig = _sign([float(x) for x in query_vec])
    q_bands = [qsig[b * band_width : (b + 1) * band_width] for b in range(bands)]

    cand_filter = F.lit(False)
    for b, qb in enumerate(q_bands):
        cand_filter = cand_filter | (F.substring("sig", b * band_width + 1, band_width) == qb)
    candidates = signed.filter(cand_filter)

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        candidates.select("vec_id", cosine_col(F.col("v"), q).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def all_pairs_topk(
    embeddings: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Per-vector approximate k-NN across the corpus: bucket by signature
    band, pair within buckets, exact cosine, windowed top-k. The
    band-bucket join bounds the pair fan-out (vs the quadratic cross
    join), which is the whole game at corpus scale."""
    vec = F.col(vec_col).cast("array<double>")
    probe = embeddings.select(F.size(vec).alias("d")).limit(1).collect()
    if not probe:  # empty corpus -> empty result with the right shape
        return embeddings.select(
            F.col(id_col).alias("a"),
            F.col(id_col).alias("b"),
            F.lit(0.0).alias("cosine"),
            F.lit(0).alias("rank"),
        ).limit(0)
    dim = probe[0]["d"]
    signed = embeddings.select(
        F.col(id_col).alias("vec_id"), vec.alias("v"), signature_col(vec, dim, bits).alias("sig")
    )
    band_width = bits // bands
    banded = signed.select(
        "vec_id",
        "v",
        F.explode(
            F.array(
                *[
                    F.concat_ws(":", F.lit(str(b)), F.substring("sig", b * band_width + 1, band_width))
                    for b in range(bands)
                ]
            )
        ).alias("bucket"),
    )
    lhs = banded.select(F.col("vec_id").alias("a"), F.col("v").alias("va"), "bucket")
    rhs = banded.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"), "bucket")
    pairs = (
        lhs.join(rhs, "bucket")
        .filter(F.col("a") != F.col("b"))
        .select("a", "b", cosine_col(F.col("va"), F.col("vb")).alias("cosine"))
        .dropDuplicates(["a", "b"])
    )
    w = Window.partitionBy("a").orderBy(F.col("cosine").desc(), F.col("b"))
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
