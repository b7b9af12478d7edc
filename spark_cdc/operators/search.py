"""Corpus keyword search: inverted index + BM25 ranking.

The retrieval sibling of the ANN family — training-data pipelines need
lexical search as much as vector search ("find every document
mentioning X", contamination checks against eval sets, targeted
inspection of a 10^9-doc corpus). Everything is built from relational
primitives Catalyst can optimize:

- :func:`bm25_index` — explode tokens → per-(token, doc) term
  frequency + doc length: the classic inverted index as a DataFrame,
  buildable once and persistable partitioned by token prefix;
- :func:`bm25_scores` / :func:`bm25_topk` — Okapi BM25. Query terms
  become an ``isin`` filter on the token column (pushed down to the
  index scan — and with the token-bucketed maintained index of
  :func:`spark_cdc.operators.index_maint.create_bm25_index_table`,
  into bucket + file pruning), per-token document frequencies are
  a tiny broadcast join, and the final per-doc score is one sum
  aggregate.
- :func:`bm25_batch_scores` / :func:`bm25_batch_topk` — N queries in
  ONE pass: union-of-terms probe once, (query_id, token) membership
  broadcast, one aggregate per (query, doc).

No UDFs anywhere — the whole pipeline is JVM column expressions, so it
sits fully under the DuckDB oracle (entries ``text_bm25_batch``,
``bm25_index_incremental``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_cdc.functions.text import normalize_text_expr


def _tokens(c) -> "F.Column":
    return F.split(F.lower(normalize_text_expr(c)), r"\s+")


def bm25_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverted index rows ``(token, doc_id, tf, dl)``: term frequency
    of token in doc, and the doc's token count. One explode + one
    groupBy (map-side combinable); at 100 TB persist it partitioned or
    bucketed by token so query probes prune to their postings."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        _tokens(F.col(text_col)).alias("_toks"),
    ).withColumn("dl", F.size("_toks"))
    return (
        toks.select("doc_id", "dl", F.explode("_toks").alias("token"))
        .where(F.col("token") != "")
        .groupBy("token", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def index_stats(index: DataFrame) -> tuple[int, float]:
    """(N, avgdl) from a prebuilt inverted index — one bounded driver
    aggregate over the skinny (doc_id, dl) projection. N counts docs
    with ≥1 token (zero-token docs have no postings and can never
    match, so excluding them only perturbs idf by their count)."""
    row = (
        index.select("doc_id", "dl")
        .groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
        .agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
        .first()
    )
    return int(row["n"]), float(row["avgdl"] or 0.0)


def bm25_scores(
    docs: DataFrame | None,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    index: DataFrame | None = None,
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """Okapi BM25 score of every document matching ≥1 query term:
    ``(doc_id, score)``. idf = ln(1 + (N − df + ½)/(df + ½)).

    Corpus stats (N, avgdl) are one bounded driver aggregate; document
    frequencies of the query's terms are |query| rows (broadcast).
    Pass a prebuilt ``index`` to amortize the inverted-index build
    across queries — with it the corpus is NEVER rescanned (stats come
    from the index via :func:`index_stats`, so ``docs`` may be None);
    pass ``stats`` too to amortize even that aggregate across a query
    batch."""
    qtokens = sorted({t for t in query.lower().split() if t})
    if not qtokens:
        raise ValueError("empty query")
    if index is None:
        if docs is None:
            raise ValueError("need docs or a prebuilt index")
        idx = bm25_index(docs, text_col, id_col)
    else:
        idx = index
    if stats is not None:
        n, avgdl = stats
    elif index is not None:
        n, avgdl = index_stats(idx)
    else:
        row = docs.select(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.size(_tokens(F.col(text_col)))).alias("avgdl"),
        ).first()
        n, avgdl = row["n"], float(row["avgdl"])
    postings = idx.where(F.col("token").isin(qtokens))
    df_ = postings.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    scored = (
        postings.join(F.broadcast(df_), "token")
        .withColumn(
            "_s",
            idf
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + F.lit(k1) * (1 - b + b * F.col("dl") / F.lit(avgdl))),
        )
    )
    return scored.groupBy("doc_id").agg(F.sum("_s").alias("score"))


def bm25_batch_scores(
    docs: DataFrame | None,
    queries: list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    index: DataFrame | None = None,
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """BM25 scores for a BATCH of queries in ONE pass:
    ``(query_id, doc_id, score)``. ``queries`` is a list of
    ``(query_id, text)`` pairs.

    A training pipeline runs thousands of contamination / inspection
    queries; scoring them one :func:`bm25_scores` job at a time re-pays
    the postings probe per query. Here the probe happens ONCE for the
    union of all query terms, per-token document frequencies are one
    tiny broadcast, the (query_id, token) membership table is a second
    broadcast, and the per-(query, doc) score is a single sum aggregate
    — N queries cost one index scan + one shuffle regardless of N.
    Same formula and tokenization as :func:`bm25_scores` (pinned equal
    by pytest; driver oracle ``text_bm25_batch``)."""
    qterms: list[tuple] = []
    for qid, qtext in queries:
        toks = sorted({t for t in qtext.lower().split() if t})
        if not toks:
            raise ValueError(f"empty query {qid!r}")
        qterms.extend((qid, t) for t in toks)
    if not qterms:
        raise ValueError("empty query batch")
    all_tokens = sorted({t for _, t in qterms})
    if index is None:
        if docs is None:
            raise ValueError("need docs or a prebuilt index")
        idx = bm25_index(docs, text_col, id_col)
    else:
        idx = index
    if stats is not None:
        n, avgdl = stats
    elif index is not None:
        n, avgdl = index_stats(idx)
    else:
        row = docs.select(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.size(_tokens(F.col(text_col)))).alias("avgdl"),
        ).first()
        n, avgdl = row["n"], float(row["avgdl"])
    spark = idx.sparkSession
    from pyspark.sql import types as T

    qid_type = (
        T.StringType() if isinstance(qterms[0][0], str) else T.LongType()
    )
    qdf = spark.createDataFrame(
        qterms,
        T.StructType(
            [
                T.StructField("query_id", qid_type, False),
                T.StructField("token", T.StringType(), False),
            ]
        ),
    )
    postings = idx.where(F.col("token").isin(all_tokens))
    df_ = postings.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    return (
        postings.join(F.broadcast(df_), "token")
        .join(F.broadcast(qdf), "token")
        .withColumn(
            "_s",
            idf
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + F.lit(k1) * (1 - b + b * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_s").alias("score"))
    )


def bm25_batch_topk(
    docs: DataFrame | None,
    queries: list[tuple],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    index: DataFrame | None = None,
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """Per-query top-k over a query batch: ``(query_id, rank, doc_id,
    score)``, ties broken by doc_id. The window partitions by
    query_id, so queries rank in parallel; within ONE query the
    candidate set is bounded by its terms' postings (a query made only
    of stopwords over 10^9 docs should go through per-query
    :func:`bm25_topk`'s TakeOrdered instead)."""
    from pyspark.sql import Window

    s = bm25_batch_scores(
        docs, queries, text_col, id_col, k1, b, index, stats
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        s.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def bm25_topk(
    docs: DataFrame | None,
    query: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    index: DataFrame | None = None,
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """Top-k BM25 matches ``(rank, doc_id, score)`` — ties broken by
    doc_id for determinism.

    The global top-k is ``orderBy().limit(k)``, which Spark plans as
    TakeOrderedAndProject: every partition keeps its local k and only
    k-row heaps travel to the driver-side combine. (A global
    ``row_number`` window — the previous form — funneled EVERY matching
    doc through one task: a query containing a common term over 10^9
    docs is a straggler/OOM. Plan-asserted single-partition-free in
    tests/test_plans.py.) Ranks are then assigned over the k surviving
    rows only."""
    from pyspark.sql import Window

    s = bm25_scores(docs, query, text_col, id_col, k1, b, index, stats)
    topk = s.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)
    # window over ≤ k rows — bounded, not a corpus-wide funnel
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", "score")
    )
