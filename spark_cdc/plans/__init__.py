"""spark_cdc.plans — named query plans for the driver contract.

Every operator from SURVEY.md §2 that is SQL-expressible appears here
twice: as a Spark DataFrame plan and as the ANSI-SQL oracle string a
DuckDB instance runs over the same parquet tables. Column names and
rounding are aligned on both sides (the driver hashes values after
sorting columns by name).
"""

from spark_cdc.plans.queries import QUERIES, ORACLES, build

__all__ = ["QUERIES", "ORACLES", "build"]
