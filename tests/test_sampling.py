"""Chunking/packing round-5 additions: the model-exact tokenizer hook,
empty-document guard, O(n log n) first-fit bins, and caller-named
packing columns."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from spark_cdc.functions.text import toy_bpe_tokens
from spark_cdc.operators.sampling import (
    _FirstFitBins,
    chunk_documents,
    pack_chunks,
)


def _ref_toy_bpe(text, max_piece=4, vocab=None):
    """Pure-python reference of the toy BPE inference (greedy
    longest-match, 1-char fallback)."""
    out = []
    for w in text.strip().lower().split():
        i = 0
        while i < len(w):
            ln = min(max_piece, len(w) - i)
            if vocab is not None:
                while ln > 1 and w[i : i + ln] not in vocab:
                    ln -= 1
            out.append(w[i : i + ln])
            i += ln
    return out


def test_empty_docs_produce_zero_chunks(spark):
    """Round-4 advisory: '' / whitespace-only docs must emit NO chunk —
    the old F.split form emitted one phantom 1-token '' chunk that then
    leaked into packing. Both tokenizer paths guarded."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "\t\n"), (4, "real doc here")],
        "doc_id long, text string",
    )
    got = chunk_documents(df, chunk_tokens=8).collect()
    assert {r["doc_id"] for r in got} == {4}
    got_bpe = chunk_documents(
        df, chunk_tokens=8, tokenizer=toy_bpe_tokens(4)
    ).collect()
    assert {r["doc_id"] for r in got_bpe} == {4}


def test_toy_bpe_tokenizer_matches_reference(spark):
    """The pandas_udf tokenizer computes greedy longest-match toy BPE —
    checked against a pure-python reference, default and learned-vocab
    modes."""
    texts = ["Hello world", "internationalization", "a bb ccc dddd eeeee", ""]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["toks"] for r in df.select(
        "doc_id", toy_bpe_tokens(4)(F.col("text")).alias("toks")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _ref_toy_bpe(t, 4), (t, got[i])
    assert got[0] == ["hell", "o", "worl", "d"]
    vocab = frozenset({"inter", "nation", "al", "iz", "ation", "he", "llo"}
                      | set("abcdefghijklmnopqrstuvwxyz"))
    got_v = {r["doc_id"]: r["toks"] for r in df.select(
        "doc_id", toy_bpe_tokens(6, vocab)(F.col("text")).alias("toks")).collect()}
    for i, t in enumerate(texts):
        assert got_v[i] == _ref_toy_bpe(t, 6, vocab), (t, got_v[i])
    # greedy longest-match picks the learned merges, not chars
    assert got_v[1][:2] == ["inter", "nation"]


def test_chunking_with_bpe_hook_budgets_in_subword_tokens(spark):
    """chunk boundaries counted in the hook's tokens: a 10-word doc of
    8-char words = 20 subword pieces -> 2 chunks at 12 pieces/stride
    10, and every chunk's n_tokens respects the budget."""
    words = " ".join("abcdefgh" for _ in range(10))  # 8 chars -> 2 pieces each
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=12, overlap=2,
                        tokenizer=toy_bpe_tokens(4)).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["n_tokens"] for r in rows] == [12, 10]
    assert rows[0]["chunk_text"].split()[:2] == ["abcd", "efgh"]
    # overlap: last 2 pieces of chunk 0 == first 2 of chunk 1
    assert rows[0]["chunk_text"].split()[-2:] == rows[1]["chunk_text"].split()[:2]


def test_pack_chunks_capacity_invariants_under_bpe(spark):
    """Packing invariants hold when budgets come from the BPE hook:
    exactly-once assignment, no multi-member bin over capacity,
    deterministic."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}abcdefg" for j in range((i * 13) % 60 + 3)))
         for i in range(60)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, chunk_tokens=32,
                             tokenizer=toy_bpe_tokens(4)).cache()
    packed = pack_chunks(chunks, max_tokens=64, n_buckets=3).cache()
    try:
        assert packed.count() == chunks.count()
        assert packed.select("doc_id", "chunk_idx").distinct().count() == chunks.count()
        bins = packed.groupBy("pack_bucket", "pack_idx").agg(
            F.sum("n_tokens").alias("fill"), F.count(F.lit(1)).alias("members"))
        assert bins.where((F.col("fill") > 64) & (F.col("members") > 1)).count() == 0
        again = pack_chunks(chunks, max_tokens=64, n_buckets=3)
        assert packed.exceptAll(again).count() == 0
    finally:
        packed.unpersist()
        chunks.unpersist()


def test_pack_chunks_custom_columns_and_string_ids(spark):
    """Round-4 advisory: the output schema must follow the caller's
    id/idx/tokens column names AND the id column's type — string doc
    ids included."""
    chunks = spark.createDataFrame(
        [(f"doc-{i}", i % 4, 40 + (i * 7) % 100) for i in range(50)],
        "uri string, part int, tok_n int",
    )
    packed = pack_chunks(chunks, max_tokens=128, n_buckets=2,
                         id_col="uri", idx_col="part", tokens_col="tok_n")
    rows = packed.collect()
    assert set(packed.columns) == {"uri", "part", "tok_n", "pack_bucket", "pack_idx"}
    assert len(rows) == 50 and all(isinstance(r["uri"], str) for r in rows)
    fills: dict[tuple, list] = {}
    for r in rows:
        key = (r["pack_bucket"], r["pack_idx"])
        fills.setdefault(key, []).append(r["tok_n"])
    # capacity holds for every multi-member bin; oversized chunks
    # (tok_n > 128 exists in this fixture) are isolated singletons
    assert all(sum(v) <= 128 for v in fills.values() if len(v) > 1)
    assert any(len(v) == 1 and v[0] > 128 for v in fills.values())


def test_first_fit_bins_equals_linear_scan():
    """The segment-tree first-fit must produce EXACTLY the naive linear
    first-fit's assignments (same bins, same order) — it is a faster
    index, not a different algorithm."""
    import random

    rnd = random.Random(7)
    for trial in range(20):
        cap = rnd.choice([64, 128, 1024])
        items = [rnd.randint(1, cap + (5 if trial % 5 == 0 else 0))
                 for _ in range(rnd.randint(1, 400))]
        items.sort(reverse=True)  # FFD order
        # naive
        fills: list[int] = []
        naive = []
        for t in items:
            placed = None
            for b, used in enumerate(fills):
                if used + t <= cap:
                    placed = b
                    break
            if placed is None:
                placed = len(fills)
                fills.append(0)
            fills[placed] += t
            naive.append(placed)
        # tree
        bins = _FirstFitBins(capacity_hint=4)  # force growth paths
        got = []
        for t in items:
            b = bins.find_first(t)
            if b is None:
                b = bins.add_bin(max(cap - t, 0))
            else:
                bins.consume(b, t)
            got.append(b)
        assert got == naive, (trial, cap)


def test_first_fit_bins_large_bucket_is_fast():
    """10^5 items through the tree completes in seconds — the naive
    scan is O(n * bins) and degrades quadratically on a single hot
    bucket (measured minutes at this size)."""
    import random

    rnd = random.Random(1)
    items = sorted((rnd.randint(1, 512) for _ in range(100_000)), reverse=True)
    t0 = time.monotonic()
    bins = _FirstFitBins()
    for t in items:
        b = bins.find_first(t)
        if b is None:
            bins.add_bin(max(2048 - t, 0))
        else:
            bins.consume(b, t)
    assert time.monotonic() - t0 < 10.0
    assert bins.n >= 100_000 * 256 // 2048 // 2  # sane bin count


def test_pack_chunks_single_hot_bucket_spark(spark):
    """End-to-end: a single packing domain holding 10^5 chunks (the
    stopword-bucket worst case) completes through applyInPandas with
    the invariants intact."""
    n = 100_000
    chunks = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("chunk_idx"),
        (F.pmod(F.col("id") * 37, F.lit(500)) + 1).cast("int").alias("n_tokens"),
    )
    packed = pack_chunks(chunks, max_tokens=2048, n_buckets=1)
    bins = packed.groupBy("pack_idx").agg(F.sum("n_tokens").alias("fill"))
    assert packed.count() == n
    assert bins.where(F.col("fill") > 2048).count() == 0


def test_learn_bpe_vocab_and_chunk_end_to_end(spark):
    """BPE merge training over a corpus sample -> greedy longest-match
    tokenization with the learned vocab -> chunking/packing under it.
    Deterministic: same sample, same merges, same vocab."""
    from spark_cdc.functions.text import learn_bpe_vocab

    docs = spark.createDataFrame(
        [(i, "the theme there " + " ".join(f"token{j}" for j in range(i % 7 + 2)))
         for i in range(80)],
        "doc_id long, text string",
    )
    vocab = learn_bpe_vocab(docs, n_merges=50, sample_size=80, max_piece=6)
    assert vocab == learn_bpe_vocab(docs, n_merges=50, sample_size=80, max_piece=6)
    # 'th'/'the' class merges must emerge from this corpus
    assert any(p.startswith("th") for p in vocab), sorted(vocab)[:20]
    tok = toy_bpe_tokens(6, vocab)
    got = docs.select("doc_id", tok(F.col("text")).alias("toks")).collect()
    joined = {r["doc_id"]: r["toks"] for r in got}
    # round-trip: concatenating a word's pieces reproduces the word
    for r in docs.collect():
        pieces = _ref_toy_bpe(r["text"], 6, vocab)
        assert "".join(pieces) == r["text"].lower().replace(" ", "")
        assert joined[r["doc_id"]] == pieces
    # chunk budgets counted in learned-vocab tokens, packing invariants hold
    chunks = chunk_documents(docs, chunk_tokens=16, overlap=4, tokenizer=tok)
    packed = pack_chunks(chunks, max_tokens=32, n_buckets=2)
    bins = packed.groupBy("pack_bucket", "pack_idx").agg(
        F.sum("n_tokens").alias("fill"), F.count(F.lit(1)).alias("members"))
    assert bins.where((F.col("fill") > 32) & (F.col("members") > 1)).count() == 0
    assert packed.count() == chunks.count()
