"""spark_cdc.metrics — per-partition lineage/offset metrics."""

from spark_cdc.metrics.lineage import MetricsLog

__all__ = ["MetricsLog"]
