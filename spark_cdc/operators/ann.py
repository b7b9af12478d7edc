"""Similarity search over embedding columns.

- ``cosine_topk`` — exact brute-force top-k per query (the
  correctness baseline; DuckDB-oracle-checkable). Query side is
  broadcast; the scan side streams — at 100 TB this is one pass over
  the vectors per query batch with no shuffle of the big side.
- ``hyperplane_lsh_buckets`` / ``ann_topk_lsh`` — the scale path:
  sign-random-projection LSH. Vectors land in 2^bits buckets per
  table; queries probe their bucket(s) and only rank collisions.
  Hyperplanes are derived deterministically from a seed (no RNG at
  execution time → replay-stable).

Dot products use ``zip_with`` + ``aggregate`` (JVM, codegen). The
LSH signature uses the same expressions — no Python in the scan path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm(vcol):
    return F.sqrt(F.aggregate(vcol, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k neighbours for each query vector.

    ``queries(query_id, embedding)`` is expected small (broadcast);
    self-matches (same id) are excluded when ids align.
    """
    base = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("vnorm", _norm(F.col("v")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("q")
    ).withColumn("qnorm", _norm(F.col("q")))
    scored = (
        base.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.try_divide(_dot(F.col("v"), F.col("q")), F.col("vnorm") * F.col("qnorm")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def hyperplane_signature(vcol, dim: int, bits: int = 8, seed: int = 42):
    """Sign-random-projection signature as an int bucket id.

    Hyperplane components are deterministic pseudo-gaussians derived
    from xxhash64(seed, bit, dim-index) — same plane set on every
    executor and every run, no RNG state to ship.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))
    bucket = F.lit(0)
    for b in range(bits):
        plane = F.array(*[F.lit(float(x)) for x in planes[b]])
        d = _dot(vcol, plane)
        bucket = bucket + F.when(d >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def hyperplane_lsh_buckets(
    vectors: DataFrame,
    dim: int,
    bits: int = 8,
    seed: int = 42,
    tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One row per (vector, table) with that table's bucket id.
    Multiple independent tables trade compute for recall:
    P(candidate) = 1 - (1 - p^bits)^tables."""
    v = vectors.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    sigs = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                hyperplane_signature(F.col("v"), dim, bits, seed + 1000 * t).alias("bucket"),
            )
            for t in range(tables)
        ]
    )
    return v.withColumn("sig", F.explode(sigs)).select(
        id_col, "v", F.col("sig.tbl").alias("tbl"), F.col("sig.bucket").alias("bucket")
    )


def ann_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 6,
    tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: rank only vectors colliding with the query in
    ≥1 of ``tables`` independent bucket tables (candidates unioned and
    deduped before scoring). Recall vs ``cosine_topk`` is measured in
    tests; tune (bits, tables) per corpus."""
    base = hyperplane_lsh_buckets(
        vectors, dim, bits, seed, tables, id_col, vec_col
    )
    q = hyperplane_lsh_buckets(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias(vec_col)),
        dim,
        bits,
        seed,
        tables,
        id_col="query_id",
        vec_col=vec_col,
    ).select("query_id", F.col("v").alias("q"), "tbl", "bucket")
    cand = (
        base.join(F.broadcast(q), ["tbl", "bucket"])
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("vec_id"), "v", "q")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        F.try_divide(_dot(F.col("v"), F.col("q")), _norm(F.col("v")) * _norm(F.col("q"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
