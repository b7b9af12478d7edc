"""PII detection / redaction for training corpora.

A corpus that feeds model training has to be scrubbed of obvious
personal identifiers before anything is tokenized; at 100 TB that
scrub must run at scan speed. Everything here is `regexp_replace` /
`regexp_count` column expressions — JVM-side, whole-stage-codegen,
zero Python in the hot path — and every pattern is written in the
common subset of Java regex (Spark) and RE2 (DuckDB/Go scrubbers), so
the exact same redaction is reproducible by the DuckDB oracle and by
any sidecar audit tool.

Pattern-order matters and is fixed: ``email`` first (its local part
may contain dots/digits an IP pattern could nibble), then the
longer all-digit shapes (``card``) before the shorter ones
(``ssn``, ``phone``), then ``ipv4``. Within one document
`regexp_replace` is global (every occurrence).

Deliberately NOT here: NER-model PII (names, addresses). That is a
model-inference stage (mapInPandas over a batched model), not a regex;
the plumbing for that shape lives in operators/multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) in application order. Patterns stick to
# the Java-regex ∩ RE2 subset: character classes, bounded repeats, \b,
# non-capturing groups only.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b\d{4}[ \-]\d{4}[ \-]\d{4}[ \-]\d{4}\b", "<CARD>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[\-.]\d{3}[\-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)

_BY_NAME = {name: (pat, rep) for name, pat, rep in PII_PATTERNS}


def redact_pii(c: Column, types: list[str] | None = None) -> Column:
    """Replace every PII occurrence with its ``<TYPE>`` tag.

    ``types`` restricts to a subset (application order preserved).
    """
    out = c
    for name, pat, rep in PII_PATTERNS:
        if types is None or name in types:
            out = F.regexp_replace(out, pat, rep)
    return out


def pii_counts(c: Column, types: list[str] | None = None) -> dict[str, Column]:
    """Per-type occurrence counts (on the RAW text — count before you
    redact, or earlier replacements mask later patterns' matches).

    Counting and redaction therefore see different strings for
    overlapping patterns; callers that need exact audit parity with
    the redacted output should count on the same progressively
    redacted column — this helper intentionally reports raw exposure
    (how much PII the document CONTAINED).
    """
    names = [n for n, _, _ in PII_PATTERNS if types is None or n in types]
    return {n: F.regexp_count(c, F.lit(_BY_NAME[n][0])).cast("int") for n in names}


def scrub_documents(
    df: DataFrame,
    text_col: str = "text",
    types: list[str] | None = None,
    counts: bool = True,
) -> DataFrame:
    """Pipeline form: redact ``text_col`` in place, optionally append
    ``pii_<type>`` raw-exposure counts and a ``pii_total``. One fused
    scan, all JVM."""
    out = df
    if counts:
        cols = pii_counts(F.col(text_col), types)
        for n, c in cols.items():
            out = out.withColumn(f"pii_{n}", c)
        out = out.withColumn(
            "pii_total",
            sum(F.col(f"pii_{n}") for n in cols).cast("int"),
        )
    return out.withColumn(text_col, redact_pii(F.col(text_col), types))
