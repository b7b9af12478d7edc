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

Signatures are computed by an Arrow-batched numpy matmul — ONE
``(batch, dim) @ (dim, tables·bits)`` product per Arrow batch with the
plane matrix held as a closure constant. (The round-1 form built each
plane as ``F.array(*[F.lit(x) ...])`` — dim×bits×tables literal
expression nodes, a Catalyst analysis/codegen blowup at dim≥768 — and
scored through interpreted per-element higher-order functions; both
replaced.) Candidate scoring defaults to the same numpy path
(``score_arrow=True``); the JVM ``zip_with``+``aggregate`` form remains
for bit-exact oracle parity with sequential-fold engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _norm(vcol):
    return F.sqrt(F.aggregate(vcol, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_udf():
    """Vectorized cosine similarity over two array columns: stacks each
    Arrow batch into (n, dim) matrices and does one einsum — the numpy
    fast path for candidate scoring at real embedding dims."""

    @F.pandas_udf(T.DoubleType())
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack([np.asarray(x, dtype=np.float64) for x in a])
        B = np.stack([np.asarray(x, dtype=np.float64) for x in b])
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(den > 0, num / den, np.nan)
        return pd.Series(out)

    return _cos


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    score_arrow: bool = False,
) -> DataFrame:
    """Exact cosine top-k neighbours for each query vector.

    ``queries(query_id, embedding)`` is expected small (broadcast);
    self-matches (same id) are excluded when ids align.
    ``score_arrow=False`` (default) keeps the JVM sequential-fold dot
    product for bit-exact DuckDB-oracle parity; ``True`` switches to
    the numpy batch path (preferred at dim ≥ a few hundred).
    """
    # norms are materialized per side BEFORE the cross join — inside the
    # join they would be re-evaluated once per (query, vector) pair
    # (a q× blowup of the big-side norm scans)
    base = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("vnorm", _norm(F.col("v")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("q")
    ).withColumn("qnorm", _norm(F.col("q")))
    joined = base.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("query_id"))
    if score_arrow:
        cos = cosine_udf()(F.col("v"), F.col("q"))
    else:
        cos = F.try_divide(_dot(F.col("v"), F.col("q")), F.col("vnorm") * F.col("qnorm"))
    scored = joined.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def _planes(dim: int, bits: int, tables: int, seed: int) -> np.ndarray:
    """Deterministic hyperplane tensor (tables, bits, dim): same planes
    on every executor and every run — seeded PCG64, no RNG state to
    ship."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables, bits, dim))


def hyperplane_signatures_np(dim: int, bits: int = 8, tables: int = 8, seed: int = 42):
    """pandas UDF: embedding array → int array of per-table bucket ids
    (length ``tables``). All tables' signatures in one matmul per Arrow
    batch; the plane matrix is a closure constant shipped once per task
    (never a Catalyst literal)."""
    P = _planes(dim, bits, tables, seed).reshape(tables * bits, dim).T  # (dim, t·b)
    weights = 1 << np.arange(bits, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _sig(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])  # (n, dim)
        proj = M @ P  # (n, tables·bits)
        bitmat = (proj >= 0).astype(np.int64).reshape(len(vecs), tables, bits)
        buckets = (bitmat * weights).sum(axis=2).astype(np.int32)  # (n, tables)
        return pd.Series([row.tolist() for row in buckets])

    return _sig


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
    sig = hyperplane_signatures_np(dim, bits, tables, seed)
    v = vectors.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("sigs", sig(F.col("v")))
    return v.select(
        id_col, "v", F.posexplode("sigs").alias("tbl", "bucket")
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
    score_arrow: bool = True,
) -> DataFrame:
    """Approximate top-k: rank only vectors colliding with the query in
    ≥1 of ``tables`` independent bucket tables (candidates unioned and
    deduped before scoring). Recall vs ``cosine_topk`` is measured in
    tests; tune (bits, tables) per corpus. ``score_arrow=False`` keeps
    the JVM fold dot product (oracle bit-parity)."""
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
    if score_arrow:
        cos = cosine_udf()(F.col("v"), F.col("q"))
    else:
        cos = F.try_divide(_dot(F.col("v"), F.col("q")), _norm(F.col("v")) * _norm(F.col("q")))
    scored = cand.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
