"""spark_cdc.functions — scalar/vectorized function surface.

Column-expression re-implementations of the reference's per-row Python
parsers (/root/reference/stream_etl/core/processor.py:41-184,
/root/reference/etl/core/pipeline.py:54-121) plus the text-analysis
functions a training-data pipeline needs. Per-row Python is forbidden
by the north rule; everything here is either a JVM Column expression
or an Arrow-vectorized pandas UDF.
"""

from spark_cdc.functions.parsers import (
    parse_timestamp_any,
    parse_numeric_tolerant,
    ensure_date,
)
from spark_cdc.functions.text import (
    normalize_text,
    normalize_text_expr,
    token_count,
    quality_score,
    lang_id,
    fingerprint,
)
from spark_cdc.functions.pii import (
    redact_pii,
    pii_counts,
    scrub_documents,
)

__all__ = [
    "parse_timestamp_any",
    "parse_numeric_tolerant",
    "ensure_date",
    "normalize_text",
    "normalize_text_expr",
    "token_count",
    "quality_score",
    "lang_id",
    "fingerprint",
    "redact_pii",
    "pii_counts",
    "scrub_documents",
]
