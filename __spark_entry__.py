"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``data_engineering_spark/`` — queries register in
``data_engineering_spark.registry`` via the decorator in
``queries_relational.py`` / ``queries_llm.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_spark import registry  # noqa: E402

# Import order IS registration order IS the driver's sweep order. The
# relational pack goes first: those queries are sub-second each, while the
# NLP/dedup/similarity pack carries the expensive Python-UDF work — if the
# sweep runs under a wall-clock budget, the cheap majority must not queue
# behind the slow tail (round 1's sweep truncated after 50 entries and
# left every aggregation/window/TPC-H query without a hard signal).
from data_engineering_spark import queries_relational  # noqa: E402,F401  (side-effect: register)
from data_engineering_spark import queries_curation  # noqa: E402,F401
from data_engineering_spark import queries_extra  # noqa: E402,F401
from data_engineering_spark import queries_llm  # noqa: E402,F401
from data_engineering_spark.session import prepare_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §3.3 serving-index pipeline) on sf0.001."""
    prepare_session(spark)
    return registry.QUERIES["flagship_serving_index"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def bind(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            prepare_session(spark)
            return fn(spark, sf_dir)

        return wrapped

    return {name: bind(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLE)
