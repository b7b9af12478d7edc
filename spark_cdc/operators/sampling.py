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
