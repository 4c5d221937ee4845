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

# Recorded by finalize_order for the rotation-ledger reconciliation test
# (tests/test_rotation_ledger.py): the exact priority window handed to the
# driver, the rows-only waivers, and the ORIGINAL registration order (the
# canonical staleness tie-break — finalize reorders QUERIES in place, so
# the pre-reorder sequence must be captured to stay auditable).
PRIORITY_WINDOW: list[str] = []
ROWS_ONLY_WAIVERS: frozenset[str] = frozenset()
ORIGINAL_ORDER: list[str] = []


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def finalize_order(
    priority: list[str], rows_only_waivers: frozenset[str] = frozenset()
) -> None:
    """Rebuild the registration (= driver sweep) order in place.

    The driver's correctness sweep checks queries in registration order
    under a bounded window, so ordering is a verification-scheduling
    decision: ``priority`` names come first (each must exist and carry an
    oracle — a priority slot spent on a rows-only query records only a
    weak ``no_oracle`` row), then the remaining oracle-backed queries in
    their original order, then every rows-only query at the tail.

    ``rows_only_waivers`` names rows-only queries DELIBERATELY granted a
    window slot — the guard otherwise hard-rejects them so no slot is
    spent by accident. A waiver records a rows-only row in the driver
    artifact (schema + row count, no value hash); the one standing use
    is superseding a stale ERR row (mm_extract_features' only driver
    record was the r1 canonicalizer crash, fixed since but unrecordable
    while the guard kept every rows-only name behind the window — r11
    verdict #5)."""
    missing = [n for n in priority if n not in QUERIES]
    if missing:
        raise KeyError(f"finalize_order: unknown queries {missing}")
    dupes = sorted({n for n in priority if priority.count(n) > 1})
    if dupes:
        raise ValueError(f"finalize_order: duplicate priority entries {dupes}")
    ORIGINAL_ORDER[:] = list(QUERIES)
    PRIORITY_WINDOW[:] = list(priority)
    global ROWS_ONLY_WAIVERS
    ROWS_ONLY_WAIVERS = frozenset(rows_only_waivers)
    weak = [n for n in priority if n not in ORACLE and n not in rows_only_waivers]
    if weak:
        raise ValueError(f"finalize_order: rows-only queries in priority window {weak}")
    seen = set(priority)
    rest_oracle = [n for n in QUERIES if n not in seen and n in ORACLE]
    rest_rows_only = [n for n in QUERIES if n not in seen and n not in ORACLE]
    ordered = list(priority) + rest_oracle + rest_rows_only
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)
