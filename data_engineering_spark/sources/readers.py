"""Readers (SURVEY §2.1 S3/S6/S7): explicit-schema policy at every
external boundary (SURVEY §7 risk 4 — the reference mixes inferred and
explicit schemas and even misspells a field, ``log_screen.py:218``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_csv", "read_json_lines", "read_with_schema", "read_orc", "write_orc"]


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | None = None, header: bool = True
) -> DataFrame:
    """S7 — CSV scan (the monitoring input, ``index_counts.ipynb`` cell 1).
    Prefer an explicit schema; ``inferSchema`` costs an extra full pass
    over the data — unacceptable at scale."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json_lines(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """S6 — line-JSON scan; gzip auto-detected by codec extension
    (replaces the reference's stream-read of UNLOAD output,
    ``Elastic_indexing.py:217-225``)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_with_schema(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S3 — re-read a source under an overridden (e.g. all-nullable)
    schema (``AWS_GLUE_ETL.py:111-117`` + ``comlib.py:300-311``)."""
    return spark.read.schema(schema).parquet(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC scan — the other columnar format a lakehouse ingests from
    (Hive-era warehouses emit it). Same predicate-pushdown / column-
    pruning behavior as parquet (ORC carries stripe-level min/max), so
    the scan-side optimizations in PLANS.md apply unchanged."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink twin of the parquet writers — interop surface for
    downstream Hive/Trino consumers."""
    df.write.mode(mode).orc(path)
