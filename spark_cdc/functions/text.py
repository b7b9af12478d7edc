"""Text analysis functions for a training-data pipeline.

The north-rule analogue of the reference's scalar normalization layer
(SURVEY.md §2.2 P11; reference normalized numerics/dates per-row,
/root/reference/stream_etl/core/processor.py:41-141 — we normalize
transcript/document *text*, vectorized).

Two tiers:

- Column-expression functions (JVM, whole-stage codegen): token_count,
  quality_score, lang_id, fingerprint, normalize_text_expr. These are
  also expressible in ANSI SQL, so they sit under the DuckDB oracle.
- ``normalize_text`` — an Arrow-vectorized pandas UDF for the one
  genuinely non-relational step (unicode NFC normalization), per the
  north rule's "vectorized pandas/Arrow UDFs, no per-row Python".
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.StringType())
def normalize_text(s: pd.Series) -> pd.Series:
    """Unicode NFC + whitespace collapse + strip, Arrow-batched.

    pandas `.str` ops are vectorized; `unicodedata.normalize` is the
    only per-value call and has no column-expression equivalent.
    """
    out = s.str.replace(r"\s+", " ", regex=True).str.strip()
    return out.map(
        lambda x: unicodedata.normalize("NFC", x) if isinstance(x, str) else x
    )


def normalize_text_expr(c: Column) -> Column:
    """JVM-only normalization (whitespace collapse + trim) — the
    SQL-expressible subset of ``normalize_text``, used where oracle
    parity matters."""
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def token_count(c: Column) -> Column:
    """Whitespace token count; '' and null → 0."""
    t = F.trim(F.coalesce(c, F.lit("")))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("int")


def quality_score(c: Column) -> Column:
    """Deterministic document-quality heuristic in [0, 1]:
    0.5·alpha_ratio + 0.3·min(tokens/100, 1) + 0.2·space_ratio-sanity.
    All ANSI-expressible (oracle-checkable)."""
    t = F.coalesce(c, F.lit(""))
    n = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_space = F.length(t) - F.length(F.regexp_replace(t, r" ", ""))
    alpha_ratio = F.when(n > 0, n_alpha / n).otherwise(F.lit(0.0))
    tok_term = F.least(token_count(c).cast("double") / F.lit(100.0), F.lit(1.0))
    space_ratio = F.when(n > 0, n_space / n).otherwise(F.lit(0.0))
    space_sane = F.lit(1.0) - F.least(F.abs(space_ratio - F.lit(0.15)) * 2, F.lit(1.0))
    return (
        F.lit(0.5) * alpha_ratio + F.lit(0.3) * tok_term + F.lit(0.2) * space_sane
    ).cast("double")


# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deliberately small + deterministic so the identical logic is
# expressible in the DuckDB oracle SQL.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "you"],
    "es": ["el", "la", "que", "de", "los"],
    "fr": ["le", "la", "les", "est", "une"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "zh": ["的", "是", "不", "我", "了"],
}


def marker_pattern(words: list[str]) -> str:
    """One alternation regex per language: a single scan counts every
    marker word (the round-1 form ran one regex pass per word — 25
    passes per row). Note the single-pass form consumes the trailing
    space of a match, so two ADJACENT marker words of the same
    language count once — a deterministic property shared with the
    DuckDB oracle, which uses the identical pattern."""
    return rf"(^|\s)({'|'.join(words)})(\s|$)"


def _marker_hits(c: Column, words: list[str]) -> Column:
    t = F.lower(F.coalesce(c, F.lit("")))
    return F.regexp_count(t, F.lit(marker_pattern(words)))


def lang_id(c: Column) -> Column:
    """Stopword-marker language ID: argmax of per-language marker hit
    counts; 'und' when nothing matches. Ties break by language-code
    order (deterministic).

    Array-argmax form: the previous nested-when tree referenced every
    per-language ``regexp_count`` from both the ``greatest`` and its
    own branch (~6 occurrences each in the expression tree — bloating
    analysis/codegen and leaning on runtime subexpression elimination
    for the regex passes); here each count appears exactly once and
    ``array_position`` picks the FIRST maximal index, which is the
    same first-language-wins tie-break."""
    scores = [(lang, _marker_hits(c, ws)) for lang, ws in sorted(LANG_MARKERS.items())]
    arr = F.array(*[s for _, s in scores])
    langs = F.array(*[F.lit(lang) for lang, _ in scores])
    best = F.array_max(arr)
    return F.when(
        best > 0, F.element_at(langs, F.array_position(arr, best).cast("int"))
    ).otherwise(F.lit("und"))


def toy_bpe_tokens(max_piece: int = 4, vocab: frozenset[str] | None = None):
    """Model-exact tokenizer hook for chunking/packing budgets: returns
    a ``Column -> Column`` producing ``array<string>`` subword pieces,
    implemented as an Arrow-vectorized pandas UDF (never per-row Python
    UDF). Pluggable into :func:`spark_cdc.operators.sampling.
    chunk_documents`'s ``tokenizer=`` so chunk boundaries are counted
    in the MODEL's tokens, not whitespace words.

    Tokenization = lowercase → whitespace-split → greedy longest-match
    subword segmentation of each word (BPE-style inference): at each
    position take the longest in-vocab piece of length ≤ ``max_piece``,
    falling back to the single character (always in-vocab).

    ``vocab=None`` means EVERY piece of length ≤ ``max_piece`` is
    in-vocab, so greedy longest-match degenerates to fixed-width
    ``max_piece``-char chopping — deterministic and ANSI-SQL
    expressible, which is what lets the driver's DuckDB oracle check
    the hook-engaged chunking value-for-value
    (entry ``chunk_documents_bpe``). Pass a real merge vocab (e.g.
    learned from a corpus sample) for production BPE behavior; the
    packing invariants are pinned under a learned vocab by
    tests/test_sampling.py."""
    import re as _re

    from pyspark.sql import types as _T

    ws = _re.compile(r"\s+")

    def _one(t):
        if not isinstance(t, str):
            return []
        out: list[str] = []
        for w in ws.split(t.strip().lower()):
            if not w:
                continue
            i = 0
            while i < len(w):
                ln = min(max_piece, len(w) - i)
                if vocab is not None:
                    while ln > 1 and w[i : i + ln] not in vocab:
                        ln -= 1
                out.append(w[i : i + ln])
                i += ln
        return out

    @F.pandas_udf(_T.ArrayType(_T.StringType()))
    def _tok(texts: pd.Series) -> pd.Series:
        return texts.map(_one)

    return lambda c: _tok(c)


def learn_bpe_vocab(
    docs,
    text_col: str = "text",
    n_merges: int = 200,
    sample_size: int = 10_000,
    max_piece: int = 8,
) -> frozenset[str]:
    """Learn a subword vocab from the corpus with classic BPE merge
    training, driver-side over a bounded hash-ordered sample — the same
    deterministic bounded-collect discipline as
    :func:`spark_cdc.operators.ann.train_pq_codebooks` (no RNG, replay-
    stable, O(sample) driver memory at any corpus size).

    Training: start from characters, repeatedly merge the most frequent
    adjacent symbol pair (ties broken lexicographically) ``n_merges``
    times over the sample's word-frequency table. Returns the resulting
    piece inventory (every surviving symbol of length ≤ ``max_piece``)
    for :func:`toy_bpe_tokens`'s greedy longest-match INFERENCE —
    WordPiece-style inference over BPE-learned merges, the common
    production pairing. Single characters always remain in-vocab via
    the tokenizer's fallback."""
    from collections import Counter

    rows = (
        docs.select(F.lower(F.col(text_col)).alias("t"))
        .where(F.col(text_col).isNotNull())
        .orderBy(F.xxhash64(F.col(text_col)))
        .limit(sample_size)
        .collect()
    )
    word_freq: Counter = Counter()
    for r in rows:
        for w in r["t"].split():
            if w:
                word_freq[w] += 1
    # symbol sequences per distinct word
    seqs: dict[tuple[str, ...], int] = {tuple(w): f for w, f in word_freq.items()}
    vocab: set[str] = set()
    for _ in range(n_merges):
        pair_freq: Counter = Counter()
        for seq, f in seqs.items():
            for a, b in zip(seq, seq[1:]):
                if len(a) + len(b) <= max_piece:
                    pair_freq[(a, b)] += f
        if not pair_freq:
            break
        best = max(pair_freq.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merged = best[0] + best[1]
        vocab.add(merged)
        new_seqs: dict[tuple[str, ...], int] = {}
        for seq, f in seqs.items():
            out: list[str] = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs[tuple(out)] = new_seqs.get(tuple(out), 0) + f
        seqs = new_seqs
    return frozenset(vocab)


def fingerprint(c: Column) -> Column:
    """Document fingerprint: md5 of the normalized (collapsed
    whitespace, lower-cased) text — stable across engines, used as the
    exact-dedup key."""
    return F.md5(F.lower(normalize_text_expr(F.coalesce(c, F.lit("")))))
