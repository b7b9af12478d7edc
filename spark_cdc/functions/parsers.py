"""Tolerant value parsers as pure Column expressions (SURVEY.md §2.2).

The reference parsed messy CDC values row-by-row in Python:

- ``_parse_numeric`` — strip non-numeric chars, float(), fallback 1.0
  (/root/reference/stream_etl/core/processor.py:41-68). The 1.0
  fallback silently fabricates data; our policy is **null** (callers
  route nulls to a dead-letter side output instead).
- ``_parse_date`` — ISO strings, epoch seconds/millis/micros by
  magnitude cutoff 32503680000, five date formats
  (processor.py:70-141, cutoffs at :93-100).

Here both are vectorized Column expression trees: whole-stage-codegen
JVM execution, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Epoch magnitude cutoffs (mirroring processor.py:93-100): values below
# EPOCH_MAX_SECONDS are seconds (covers dates to year ~3000), below
# EPOCH_MAX_SECONDS*1000 millis, else micros.
EPOCH_MAX_SECONDS = 32503680000  # 3000-01-01


def parse_numeric_tolerant(c: Column) -> Column:
    """``"$3.99"`` → 3.99, ``"2.5"`` → 2.5, ``"invalid"`` → null.

    Unlike the reference's 1.0 fallback (processor.py:66-68) malformed
    input yields null — pair with ``.filter(col.isNull())`` for a
    dead-letter stream.
    """
    cleaned = F.regexp_replace(F.trim(c.cast("string")), r"[^0-9.\-]", "")
    return F.when(cleaned == "", F.lit(None)).otherwise(cleaned).try_cast("double")


def parse_timestamp_any(c: Column) -> Column:
    """Polymorphic timestamp parse: ISO 8601 (with/without 'Z' or
    fractional seconds), ``yyyy-MM-dd``, ``yyyy/MM/dd``,
    ``dd-MM-yyyy``, and bare epoch seconds / millis / micros chosen by
    magnitude (processor.py:93-100 heuristics, vectorized)."""
    s = F.trim(c.cast("string"))
    num = s.try_cast("double")
    epoch_seconds = (
        F.when(F.abs(num) < F.lit(float(EPOCH_MAX_SECONDS)), num)
        .when(F.abs(num) < F.lit(float(EPOCH_MAX_SECONDS) * 1e3), num / 1e3)
        .otherwise(num / 1e6)
    )
    from_epoch = F.timestamp_seconds(epoch_seconds)
    iso = F.regexp_replace(s, r"Z$", "")
    from_text = F.coalesce(
        F.try_to_timestamp(iso),
        F.try_to_timestamp(iso, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")),
        F.try_to_timestamp(iso, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(iso, F.lit("yyyy/MM/dd")),
        F.try_to_timestamp(iso, F.lit("dd-MM-yyyy")),
    )
    return F.when(num.isNotNull(), from_epoch).otherwise(from_text)


def ensure_date(c: Column) -> Column:
    """Date normalization (processor.py:143-184): timestamps and
    parseable strings → DATE, else null."""
    return F.to_date(parse_timestamp_any(c))
