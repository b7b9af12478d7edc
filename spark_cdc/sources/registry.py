"""Parquet testdata registry (TESTDATA.md tables)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    out = {}
    for name in tables or TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    dfs = load_tables(spark, sf_dir, tables)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
