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


def _metrics(ws: str, bg: str = "_qg_bg") -> dict[str, Column]:
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
        "aggregate(sort_array(" + bg + "), "
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
            f"CASE WHEN size({bg}) = 0 THEN CAST(0.0 AS DOUBLE) "
            f"ELSE CAST({top_run} AS DOUBLE) / size({bg}) END"
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
    # collision-safe internal names: an input column named ws/bg must
    # survive the pipeline untouched (round-6 advisory)
    m = _metrics("_qg_ws")
    out = df.withColumn("_qg_ws", words_expr(F.col(text_col)))
    out = out.withColumn("n_words", m["n_words"])
    out = out.withColumn("mean_word_len", F.round(m["mean_word_len"], round_to))
    out = out.withColumn("dup_word_frac", F.round(m["dup_word_frac"], round_to))
    out = out.withColumn("_qg_bg", m["_bg"])
    out = out.withColumn("top_bigram_frac", F.round(m["top_bigram_frac"], round_to))
    out = out.withColumn("stopword_frac", F.round(m["stopword_frac"], round_to))
    keep = (
        (F.col("n_words") >= F.lit(g["min_words"]))
        & F.col("mean_word_len").between(g["min_mean_word_len"], g["max_mean_word_len"])
        & (F.col("dup_word_frac") <= F.lit(g["max_dup_word_frac"]))
        & (F.col("top_bigram_frac") <= F.lit(g["max_top_bigram_frac"]))
        & (F.col("stopword_frac") >= F.lit(g["min_stopword_frac"]))
    )
    return out.withColumn("keep", keep).drop("_qg_ws", "_qg_bg")


def filter_quality(
    df: DataFrame, text_col: str = "text", gates: dict[str, float] | None = None
) -> DataFrame:
    """The pipeline form: original columns, failing documents dropped."""
    return (
        quality_gates(df, text_col=text_col, gates=gates)
        .where(F.col("keep"))
        .select(*df.columns)
    )


def dedup_lines_expr(c: Column, sep: str = "\n") -> Column:
    """Order-preserving removal of repeated lines inside one document
    (boilerplate nav/footer lines repeated through a crawl page — the
    within-document half of C4's line dedup, run before any
    cross-document pass). First occurrence wins; later duplicates
    drop; original order is otherwise kept.

    Pure JVM: split → two-arg filter lambda (keep element i iff the
    line's FIRST occurrence is position i) → rejoin. O(lines²) per
    document worst case, on arrays of at most a few hundred lines."""
    import re as _re

    pat = _re.escape(sep)
    parts = F.split(c, pat, -1)
    kept = F.filter(parts, lambda x, i: F.array_position(parts, x) == i + 1)
    return F.array_join(kept, sep)


def dedup_lines(df: DataFrame, text_col: str = "text", sep: str = "\n") -> DataFrame:
    """Pipeline form of :func:`dedup_lines_expr` (text replaced in place)."""
    return df.withColumn(text_col, dedup_lines_expr(F.col(text_col), sep))


# ----------------------------------------------------------- char-n-gram LM

def char_ngrams_expr(c: Column, n: int = 3) -> Column:
    """All character n-grams of the normalized text (lowercased,
    whitespace collapsed) as array<string>; shorter-than-n docs yield
    an empty array. JVM-only: substring over an offset sequence."""
    t = F.lower(F.trim(F.regexp_replace(F.coalesce(c, F.lit("")), r"\s+", " ")))
    return F.when(F.length(t) < n, F.expr("CAST(array() AS ARRAY<STRING>)")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(t) - F.lit(n - 1)),
            lambda i: F.substring(t, i, F.lit(n)),
        )
    )


class CharLM:
    """KenLM-style character n-gram language model for corpus quality
    scoring — the model-based signal real pipelines run NEXT TO the
    heuristic gates (CCNet/Gopher both filter on LM perplexity; a full
    KenLM is out of scope, a char-(n)-gram model with add-one smoothing
    is the same shape and fully deterministic).

    ``model`` is a small DataFrame ``(gram, ctx, cnt, ctx_cnt)`` of
    training counts (gram = n chars, ctx = its first n−1 chars);
    ``vocab`` is the training alphabet size (distinct final chars),
    the add-one denominator. Scoring is per-document mean log
    P(char | ctx) with P = (cnt+1)/(ctx_cnt+V): higher = more like the
    training corpus; junk/garbled text scores sharply lower.

    Scale shape: training is two corpus-scan aggregates over exploded
    grams (map-side combinable); the model is alphabet-bounded (tiny),
    so scoring is two BROADCAST joins (gram, then ctx for unseen
    grams) plus one groupBy(doc) — the corpus never sort-merge joins.
    """

    def __init__(self, model: DataFrame, n: int, vocab: int):
        self.model = model
        self.n = n
        self.vocab = vocab

    @staticmethod
    def train(df: DataFrame, text_col: str = "text", n: int = 3) -> "CharLM":
        grams = df.select(
            F.explode(char_ngrams_expr(F.col(text_col), n)).alias("gram")
        )
        counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
        counts = counts.withColumn("ctx", F.substring("gram", 1, n - 1))
        ctx_counts = counts.groupBy("ctx").agg(F.sum("cnt").alias("ctx_cnt"))
        model = counts.join(ctx_counts, "ctx").select("gram", "ctx", "cnt", "ctx_cnt")
        vocab = counts.select(
            F.countDistinct(F.substring("gram", n, 1)).alias("v")
        ).collect()[0]["v"]
        return CharLM(model.cache(), n, int(vocab))

    def score(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str | None = None,
        score_col: str = "lm_score",
        round_to: int = 6,
    ) -> DataFrame:
        """Append mean log P(char | ctx); empty/too-short docs get
        NULL. Two broadcast joins + one per-doc aggregate, joined back
        skinny on ``id_col``.

        Pass ``id_col`` (a unique key) whenever one exists:
        the fallback tags rows with ``monotonically_increasing_id``,
        which is only safe because the tagged frame is the single
        common subtree of both join branches — but it blocks scan
        pushdown and is re-evaluated on task retry, so a real key is
        always the better plan."""
        v = F.lit(float(self.vocab))
        cols = df.columns
        if id_col is not None:
            with_id = df.withColumn("_lm_rid", F.col(id_col))
        else:
            with_id = df.withColumn("_lm_rid", F.monotonically_increasing_id())
        grams = with_id.select(
            "_lm_rid",
            F.posexplode(char_ngrams_expr(F.col(text_col), self.n)).alias("_pos", "gram"),
        ).withColumn("ctx", F.substring("gram", 1, self.n - 1))
        gmod = self.model.select("gram", "cnt")
        cmod = self.model.select("ctx", "ctx_cnt").dropDuplicates(["ctx"])
        scored = (
            grams.join(F.broadcast(gmod), "gram", "left")
            .join(F.broadcast(cmod), "ctx", "left")
            .withColumn(
                "_lp",
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1.0))
                    / (F.coalesce(F.col("ctx_cnt"), F.lit(0)) + v)
                ),
            )
            .groupBy("_lm_rid")
            .agg(F.round(F.avg("_lp"), round_to).alias(score_col))
        )
        return (
            with_id.join(scored, "_lm_rid", "left")
            .select(*cols, score_col)
        )


def gate_changes(
    changes: DataFrame,
    text_col: str = "text",
    gates: dict[str, float] | None = None,
    op_col: str = "op",
    delete_op: str = "d",
) -> DataFrame:
    """CDC-correct quality gating of a change-event stream.

    Filtering change events by payload quality is NOT a row filter: an
    update that degrades a document below the gate must REMOVE the
    document from the serving table, not merely skip the event (a
    skip leaves the stale good version serving forever). So upserts
    whose post-image fails the gate are converted into deletes; real
    deletes pass through untouched; a failing insert for a never-seen
    key becomes a delete of an absent key, which the merge treats as a
    no-op. A later update that lifts the document back over the gate
    re-inserts it — the serving table always holds exactly the
    currently-passing versions.

    Pure projection over the change batch (the gate metrics are the
    same fused JVM expressions as :func:`quality_gates`); plug it in
    front of ``apply_batch`` or inside a ``foreachBatch``.
    """
    gated = quality_gates(changes, text_col=text_col, gates=gates)
    flipped = gated.withColumn(
        op_col,
        F.when(
            (F.col(op_col) != F.lit(delete_op)) & ~F.col("keep"),
            F.lit(delete_op),
        ).otherwise(F.col(op_col)),
    )
    return flipped.select(*changes.columns)
