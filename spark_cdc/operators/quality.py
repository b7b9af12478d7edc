"""Corpus quality gates — Gopher/C4-style heuristic document filters.

The reference pipeline has no document-quality story (it moves adtech
rows); a training-data pipeline runs these gates on every crawled
document before anything expensive (dedup, tokenization) touches it,
so the filter has to be a pure single-scan projection. Every metric
here is a JVM column expression (split / higher-order functions /
sort_array run-length aggregate) — one corpus scan computes all of
them fused, no UDF, no shuffle, no driver loop. That is the shape that
survives 100 TB: the gate runs at scan speed and Catalyst prunes it to
the two columns it reads (id + text).

Metrics (per document, whitespace tokenization matching
:func:`spark_cdc.functions.text.token_count`):

- ``n_words`` — token count.
- ``mean_word_len`` — mean characters per token (Gopher: 3–10 band).
- ``dup_word_frac`` — 1 − distinct/total tokens: in-document
  repetition (the word-level analogue of Gopher's duplicate-line
  fraction, which is degenerate on single-line documents).
- ``top_bigram_frac`` — mass of the most frequent word bigram over
  all bigrams (Gopher's top-2-gram fraction). Computed WITHOUT a
  per-document groupBy: sort the bigram array, then the longest run
  of equal adjacent elements IS the top count — a single
  ``aggregate`` higher-order fold, O(n log n) per doc, zero shuffle.
- ``stopword_frac`` — fraction of tokens in a small function-word
  list (Gopher's "must contain stop words" signal).

``quality_gates`` appends the metrics plus a ``keep`` verdict from
configurable thresholds. Thresholds are data-calibrated defaults for
wordlike corpora; pass your own for a real crawl.

All expressions are ANSI-expressible, so the whole gate sits under the
DuckDB value oracle (driver entry ``corpus_quality_gates``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small function-word list: presence of ANY of these is the Gopher
# "contains stop words" sanity signal. Deliberately tiny and fixed —
# the gate needs a stable, engine-portable definition, not linguistics.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "of", "to", "in", "and", "is", "on", "that",
)

#: Default keep-thresholds. Calibrated so the gate actually
#: discriminates on wordlike corpora (synthetic fixture: ~34% keep);
#: a real crawl pipeline passes its own.
DEFAULT_GATES: dict[str, float] = {
    "min_words": 20,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_dup_word_frac": 0.6,
    "max_top_bigram_frac": 0.08,
    "min_stopword_frac": 0.05,
}


def words_expr(c: Column) -> Column:
    """Whitespace tokens as array<string>; '' and null → empty array.

    ``array_remove(…, '')`` guards the whitespace-only document (split
    yields ['']) — same convention as ``chunk_documents``.
    """
    t = F.trim(F.coalesce(c, F.lit("")))
    return F.array_remove(F.split(F.regexp_replace(t, r"\s+", " "), " "), "")


def _metrics(ws: str) -> dict[str, Column]:
    """Metric columns over a prepared token-array column name ``ws``.

    String-built expressions because slice/zip_with/aggregate lambdas
    over another column's size are clumsy through the Python DSL.
    NOTE: expressions here are lambda higher-order functions — fine
    over a plain scan, but do not project them above a UNION that is
    later joined (Spark 4.1 PruneFilters NPE, see
    spark_cdc/operators/temporal.py).
    """
    n = f"size({ws})"
    guard = lambda e: f"CASE WHEN {n} = 0 THEN CAST(0.0 AS DOUBLE) ELSE {e} END"  # noqa: E731
    bigrams = (
        f"CASE WHEN {n} >= 2 THEN zip_with(slice({ws}, 1, {n} - 1), "
        f"slice({ws}, 2, {n} - 1), (a, b) -> concat(a, ' ', b)) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    # longest equal-adjacent run of the SORTED bigram array == count of
    # the most frequent bigram; a single fold, no per-doc groupBy
    top_run = (
        "aggregate(sort_array(bg), "
        "named_struct('best', 0, 'cur', 0, 'prev', CAST(NULL AS STRING)), "
        "(acc, x) -> named_struct("
        "  'best', greatest(acc.best, IF(x <=> acc.prev, acc.cur + 1, 1)), "
        "  'cur', IF(x <=> acc.prev, acc.cur + 1, 1), "
        "  'prev', x), "
        "acc -> acc.best)"
    )
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return {
        "n_words": F.expr(n).cast("int"),
        "mean_word_len": F.expr(
            guard(f"CAST(aggregate({ws}, 0, (a, x) -> a + length(x)) AS DOUBLE) / {n}")
        ),
        "dup_word_frac": F.expr(
            guard(f"1.0 - CAST(size(array_distinct({ws})) AS DOUBLE) / {n}")
        ),
        "_bg": F.expr(bigrams),
        "top_bigram_frac": F.expr(
            f"CASE WHEN size(bg) = 0 THEN CAST(0.0 AS DOUBLE) "
            f"ELSE CAST({top_run} AS DOUBLE) / size(bg) END"
        ),
        "stopword_frac": F.expr(
            guard(
                f"CAST(size(filter({ws}, x -> array_contains(array({stop_list}), x))) "
                f"AS DOUBLE) / {n}"
            )
        ),
    }


def quality_gates(
    df: DataFrame,
    text_col: str = "text",
    gates: dict[str, float] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Append quality metrics + a ``keep`` verdict to every document.

    One fused scan; all metrics are JVM column expressions. ``gates``
    overrides :data:`DEFAULT_GATES` (missing keys take defaults).
    Metrics are rounded to ``round_to`` decimals so downstream value
    comparisons (and the DuckDB oracle) are representation-stable.
    """
    g = {**DEFAULT_GATES, **(gates or {})}
    m = _metrics("ws")
    out = df.withColumn("ws", words_expr(F.col(text_col)))
    out = out.withColumn("n_words", m["n_words"])
    out = out.withColumn("mean_word_len", F.round(m["mean_word_len"], round_to))
    out = out.withColumn("dup_word_frac", F.round(m["dup_word_frac"], round_to))
    out = out.withColumn("bg", m["_bg"])
    out = out.withColumn("top_bigram_frac", F.round(m["top_bigram_frac"], round_to))
    out = out.withColumn("stopword_frac", F.round(m["stopword_frac"], round_to))
    keep = (
        (F.col("n_words") >= F.lit(g["min_words"]))
        & F.col("mean_word_len").between(g["min_mean_word_len"], g["max_mean_word_len"])
        & (F.col("dup_word_frac") <= F.lit(g["max_dup_word_frac"]))
        & (F.col("top_bigram_frac") <= F.lit(g["max_top_bigram_frac"]))
        & (F.col("stopword_frac") >= F.lit(g["min_stopword_frac"]))
    )
    return out.withColumn("keep", keep).drop("ws", "bg")


def filter_quality(
    df: DataFrame, text_col: str = "text", gates: dict[str, float] | None = None
) -> DataFrame:
    """The pipeline form: original columns, failing documents dropped."""
    return (
        quality_gates(df, text_col=text_col, gates=gates)
        .where(F.col("keep"))
        .select(*df.columns)
    )
