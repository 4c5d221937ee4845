"""Named-query registry backing ``__spark_entry__.py``.

Every operator from SURVEY §2 registers here as a ``(spark, sf_dir) →
DataFrame`` callable plus (when SQL-expressible) a DuckDB oracle string.
The decorator keeps the Spark implementation and its oracle side by side
so column aliases stay in lock-step (the driver hash-compares by sorted
column name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
