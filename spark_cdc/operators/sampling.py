"""Deterministic dataset splitting / sampling for training pipelines.

``randomSplit`` is the obvious Spark tool, but it is the WRONG one for
a training corpus: assignments change with partitioning, seed plumbing
and data order, so yesterday's validation document can silently become
today's training document. Hash-based assignment fixes that — a row's
split depends only on its key:

- **stable under growth**: appending new documents never reassigns an
  existing one (no train/val leakage across pipeline runs);
- **engine-portable**: md5 is identical everywhere, so the DuckDB
  oracle (and any other system auditing the corpus) reproduces the
  exact assignment — Spark's xxhash64 would not be;
- **pure projection**: no shuffle, no state, pushes through the scan.

The reference has no sampling/splitting story (its pipeline moved
adtech rows); this is part of the training-data operator family the
engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_PRECISION = 4  # 16^4 = 65536 assignment buckets (±0.0015% granularity)


def split_thresholds(fractions: dict[str, float], precision: int = HEX_PRECISION) -> list[tuple[str, str]]:
    """[(split_name, upper_hex_bound)] with the last split unbounded.
    Bounds are cumulative-fraction positions in the hex key space —
    e.g. {'train': .8, 'val': .1, 'test': .1} → [('train','cccc'),
    ('val','e666'), ('test', None)]."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out: list[tuple[str, str]] = []
    names = list(fractions)
    cum = 0.0
    space = 16 ** precision
    for name in names[:-1]:
        cum += fractions[name]
        out.append((name, format(int(cum * space), f"0{precision}x")))
    out.append((names[-1], None))
    return out


def hash_split_col(key_col: str | Column, fractions: dict[str, float],
                   precision: int = HEX_PRECISION,
                   null_split: str | None = None) -> Column:
    """Column expression assigning each row a split name from the md5
    of its key — usable inside any select/filter.

    A NULL key gets ``null_split`` (default: a NULL split name) rather
    than silently falling through to the last-listed split: md5(NULL)
    is NULL, so every WHEN condition is NULL and without the explicit
    guard null-key rows would leak deterministically into the final
    split (e.g. the eval set). Making them visible lets the pipeline
    quarantine or assert on them."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    h = F.substring(F.md5(key.cast("string")), 1, precision)
    expr = F.when(key.isNull(), F.lit(null_split))
    for name, bound in split_thresholds(fractions, precision):
        if bound is None:
            expr = expr.otherwise(F.lit(name))
        else:
            expr = expr.when(h < F.lit(bound), F.lit(name))
    return expr


def hash_split(df: DataFrame, key_col: str, fractions: dict[str, float],
               split_col: str = "split", precision: int = HEX_PRECISION,
               null_split: str | None = None) -> DataFrame:
    """Append a deterministic split-assignment column."""
    return df.withColumn(
        split_col, hash_split_col(key_col, fractions, precision, null_split)
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer=None,
) -> DataFrame:
    """Split documents into fixed-size token-window chunks — the
    context-window preparation step of a training pipeline: one row per
    (doc, chunk) with ``chunk_idx``, the chunk text and its token
    count. ``overlap`` tokens are shared between consecutive chunks
    (stride = chunk_tokens − overlap).

    Pure JVM expressions (split → sequence of window starts →
    transform slices → posexplode): no UDF, no shuffle — a projection
    that scales with the scan and pushes column pruning through.

    ``tokenizer``: optional ``Column -> Column`` producing
    ``array<string>`` — the model-exact boundary hook. Pass an
    Arrow-vectorized pandas_udf tokenizer (e.g.
    :func:`spark_cdc.functions.text.toy_bpe_tokens`) and chunk/pack
    budgets are counted in ITS tokens; slicing/exploding stays JVM.
    Default (None) is deterministic whitespace tokenization matching
    :func:`spark_cdc.functions.text.token_count`'s convention. An
    empty or whitespace-only document yields zero chunks under either
    tokenizer (phantom 1-token '' samples would otherwise leak into
    packing).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    if tokenizer is None:
        # array_remove('') doubles as the empty-document guard: split
        # of a whitespace-only text yields [''] (size 1), which must
        # produce zero chunks, not one phantom 1-token chunk
        src = df
        toks = F.array_remove(
            F.split(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "), " "),
            "",
        )
    else:
        # materialize the UDF's token array in its own projection: a
        # Python UDF cannot appear inside a higher-order-function
        # lambda (the F.transform slice below), and the separate
        # ArrowEvalPython stage also evaluates the tokenizer ONCE per
        # row instead of once per window reference
        src = df.select(
            F.col(id_col),
            F.array_remove(tokenizer(F.col(text_col)), "").alias("_toks"),
        )
        toks = F.col("_toks")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(stride)).cast("int"),
        F.lit(1),
    )
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    chunks = F.transform(starts, lambda s: F.slice(toks, s + 1, chunk_tokens))
    return (
        src.select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_idx", "_chunk"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.array_join("_chunk", " ").alias("chunk_text"),
            F.size("_chunk").alias("n_tokens"),
        )
        .where(F.col("n_tokens") > 0)
    )


class _FirstFitBins:
    """Leftmost-bin-that-fits lookup in O(log n): a flat-array segment
    tree over bin remaining-capacities (max per segment), descended
    left-first. Keeps classic first-fit-decreasing SEMANTICS (identical
    assignments to the naive linear scan) while replacing its O(bins)
    inner scan — a 10^6-chunk stopword bucket degraded quadratically
    under the linear form."""

    def __init__(self, capacity_hint: int = 1024):
        self.size = 1
        while self.size < max(capacity_hint, 1):
            self.size *= 2
        self.tree = [0] * (2 * self.size)
        self.n = 0

    def _set(self, i: int, val: int) -> None:
        i += self.size
        self.tree[i] = val
        i //= 2
        while i:
            self.tree[i] = max(self.tree[2 * i], self.tree[2 * i + 1])
            i //= 2

    def remaining(self, b: int) -> int:
        return self.tree[self.size + b]

    def add_bin(self, remaining: int) -> int:
        if self.n == self.size:
            old = self.tree[self.size : self.size + self.n]
            self.size *= 2
            self.tree = [0] * (2 * self.size)
            self.tree[self.size : self.size + len(old)] = old
            for i in range(self.size - 1, 0, -1):
                self.tree[i] = max(self.tree[2 * i], self.tree[2 * i + 1])
        self._set(self.n, remaining)
        self.n += 1
        return self.n - 1

    def find_first(self, need: int) -> int | None:
        """Index of the LEFTMOST (oldest) bin with remaining ≥ need.

        ``need ≤ 0`` (a zero-token chunk handed straight to
        ``pack_chunks``) must still resolve to an ALLOCATED bin: every
        unallocated leaf holds 0, which satisfies ``≥ 0``, so without
        the bounds the descent could land on a bin that was never
        ``add_bin``'ed."""
        if self.n == 0 or self.tree[1] < need:
            return None
        i = 1
        while i < self.size:
            i = 2 * i if self.tree[2 * i] >= need else 2 * i + 1
        b = i - self.size
        return b if b < self.n else None

    def consume(self, b: int, t: int) -> None:
        self._set(b, self.tree[self.size + b] - t)


def pack_chunks(
    chunks: DataFrame,
    max_tokens: int = 2048,
    n_buckets: int | None = None,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Greedy sample packing: assign chunks to fixed-capacity token
    bins (``pack_bucket``, ``pack_idx``) — the padding-minimization
    step between :func:`chunk_documents` and batch serialization.

    Distributed shape: chunks are hash-salted into ``n_buckets``
    independent packing domains (default: the cluster parallelism), and
    first-fit-decreasing runs per bucket inside ``applyInPandas`` — an
    Arrow-batched, spill-free O(n log n) pass over that bucket's rows
    only. Global FFD would serialize the corpus through one task; the
    per-bucket approximation costs a bounded fill-factor loss (bins
    don't cross buckets) and keeps the op embarrassingly parallel at
    10^9 chunks. Deterministic: bucket = xxhash64(doc_id) mod buckets,
    in-bucket order = (tokens desc, doc_id, chunk_idx).

    Chunks longer than ``max_tokens`` get a bin of their own (callers
    should have chunked to ≤ max_tokens already). Returns one row per
    input chunk with its assignment — fully spillable; derive per-bin
    fill with a groupBy on (pack_bucket, pack_idx).

    The in-bucket first-fit scan uses :class:`_FirstFitBins` — classic
    FFD assignments, O(n log n) per bucket instead of O(n · bins).
    Output schema mirrors the caller's actual ``id_col`` name and type
    (string doc ids work); ``idx_col``/``tokens_col`` are cast to int.
    """
    import pandas as pd

    if n_buckets is None:
        n_buckets = chunks.sparkSession.sparkContext.defaultParallelism

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [tokens_col, id_col, idx_col], ascending=[False, True, True]
        ).reset_index(drop=True)
        bins = _FirstFitBins(capacity_hint=max(len(pdf) // 8, 16))
        assign = []
        for t in pdf[tokens_col]:
            t = int(t)
            placed = bins.find_first(t)
            if placed is None:
                placed = bins.add_bin(max(max_tokens - t, 0))
            else:
                bins.consume(placed, t)
            assign.append(placed)
        pdf["pack_idx"] = pd.Series(assign, dtype="int32")
        return pdf[[id_col, idx_col, tokens_col, "pack_bucket", "pack_idx"]]

    id_type = dict(chunks.dtypes)[id_col]
    schema = (
        f"`{id_col}` {id_type}, `{idx_col}` int, `{tokens_col}` int, "
        "pack_bucket int, pack_idx int"
    )
    salted = chunks.select(
        F.col(id_col), F.col(idx_col).cast("int"), F.col(tokens_col).cast("int"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int").alias("pack_bucket"),
    )
    return salted.groupBy("pack_bucket").applyInPandas(pack, schema)


def mixture_rates(
    counts: dict[str, int], alpha: float = 0.5, target_fraction: float = 0.5
) -> dict[str, float]:
    """Reference (driver-side) form of the per-domain sampling rate:
    domain weights ∝ n_d^alpha (temperature-flattened — alpha=1 is
    natural proportions, alpha=0 uniform across domains), scaled so the
    expected kept total is target_fraction·N, capped at 1. Used by
    tests; the distributed path computes the same thing in columns."""
    n_total = float(sum(counts.values()))
    wsum = sum(n**alpha for n in counts.values())
    return {
        d: min(1.0, target_fraction * n_total * (n**alpha / wsum) / n)
        for d, n in counts.items()
    }


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    alpha: float = 0.5,
    target_fraction: float = 0.5,
    salt: str = "mix:",
    precision: int = HEX_PRECISION,
    sampled_col: str = "sampled",
    rates: dict[str, float] | None = None,
) -> DataFrame:
    """Deterministic temperature-based domain mixture sampling.

    The data-mixing step of a training pipeline: upsample low-resource
    domains / downsample dominant ones to a target token budget.
    Per-domain keep rate r_d = min(1, target_fraction·N·w_d/n_d) with
    w_d = n_d^alpha / Σ n^alpha; a document is kept iff the md5 of
    (salt + key) falls under the rate's hex threshold — the same
    hash-assignment discipline as :func:`hash_split` (stable under
    corpus growth within a domain, engine-portable, pure projection
    once the tiny rate table is joined back).

    Plan shape: one groupBy(domain) aggregate (domains are few), a
    literal-key join of two scalar aggregates, then a broadcast join of
    the rate table back onto the corpus — the big side never shuffles.
    The rate is rounded to 9 decimals before the 16^precision floor so
    the threshold is bit-identical across engines (pow() may differ in
    the last ulp between libm and the JVM).

    ``salt`` decorrelates the sampling hash from :func:`hash_split`'s
    split hash — a document's split assignment and its mixture draw are
    independent.

    ``rates`` (optional): FROZEN per-domain keep rates — e.g. the
    :func:`mixture_rates` of a pinned reference corpus. With live
    rates (default), every re-crawl shifts domain counts and so
    reshuffles which documents are kept; with frozen rates a
    document's draw is a pure function of its key forever (the
    sampling twin of the frozen-quantizer discipline in
    index_maint) — retrain/refresh rates deliberately, not as a side
    effect of ingest. Unknown domains get rate 0 (kept out, loudly
    countable), so a new domain is an explicit rates-refresh decision.
    """
    key = F.col(key_col).cast("string")
    if rates is not None:
        rate_rows = [(d, float(r)) for d, r in rates.items()]
        rates_df = df.sparkSession.createDataFrame(
            rate_rows, f"`{domain_col}` string, _rate double"
        )
    else:
        counts = df.groupBy(domain_col).agg(
            F.count(F.lit(1)).cast("double").alias("_n")
        )
        totals = counts.agg(
            F.sum("_n").alias("_n_total"),
            F.sum(F.pow("_n", F.lit(alpha))).alias("_wsum"),
        )
        rates_df = (
            counts.withColumn("_k", F.lit(1))
            .join(F.broadcast(totals.withColumn("_k", F.lit(1))), "_k")
            .withColumn(
                "_rate",
                F.least(
                    F.lit(1.0),
                    F.lit(target_fraction)
                    * F.col("_n_total")
                    * (F.pow("_n", F.lit(alpha)) / F.col("_wsum"))
                    / F.col("_n"),
                ),
            )
        )
    rates_df = rates_df.withColumn(
        "_bound",
        F.format_string(
            f"%0{precision}x",
            # long, not int: 16^precision overflows int32 at
            # precision ≥ 8, nulling the bound for near-1.0 rates
            # (round-6 advisory); %x formats longs identically
            F.floor(F.round("_rate", 9) * F.lit(16**precision)).cast("long"),
        ),
    ).select(domain_col, "_rate", "_bound")
    h = F.substring(F.md5(F.concat(F.lit(salt), key)), 1, precision)
    join_how = "left" if rates is not None else "inner"
    out = df.join(F.broadcast(rates_df), domain_col, join_how)
    keep = (F.coalesce(F.col("_rate"), F.lit(0.0)) >= 1.0) | (
        F.col("_bound").isNotNull() & (h < F.col("_bound"))
    )
    return out.withColumn(sampled_col, keep.cast("int")).drop("_rate", "_bound")
