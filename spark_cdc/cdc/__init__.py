"""spark_cdc.cdc — change-data-capture core.

Envelope parsing, latest-version-per-key dedup, op routing, and the
batch/streaming apply loop. Replaces the reference's consumer/processor
(/root/reference/stream_etl/core/consumer.py,
/root/reference/stream_etl/core/processor.py) and batch ETL pipeline
(/root/reference/etl/core/pipeline.py).
"""

from spark_cdc.cdc.dedup import (
    latest_version_per_key,
    latest_version_per_key_agg,
    latest_version_per_key_salted,
)
from spark_cdc.cdc.apply import apply_batch, replay_changes_df
from spark_cdc.cdc.envelope import (
    CHANGE_SCHEMA,
    KEY_COLUMNS,
    PAYLOAD_SCHEMA,
    parse_envelope_json,
)

__all__ = [
    "latest_version_per_key",
    "latest_version_per_key_agg",
    "latest_version_per_key_salted",
    "apply_batch",
    "replay_changes_df",
    "CHANGE_SCHEMA",
    "KEY_COLUMNS",
    "PAYLOAD_SCHEMA",
    "parse_envelope_json",
]
