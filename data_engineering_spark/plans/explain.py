"""Physical-plan inspection helpers (SURVEY §4).

The reference encodes physical decisions by hand (filters inside
subqueries, 2-column scans, broadcast-sized dims); Catalyst derives them —
these helpers make that derivation *testable*: every scale-critical plan
property (pushdown, pruning, broadcast, partial agg, codegen) is asserted
in ``tests/test_plans.py`` rather than eyeballed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "broadcast_hint_count",
    "shuffle_count",
    "has_partial_aggregate",
    "wholestage_codegen_spans",
    "scan_tables",
]


def formatted_plan(df: DataFrame) -> str:
    """``explain("formatted")`` output as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (``PushedFilters: [...]``)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read from each parquet scan (``ReadSchema``) —
    the check that column pruning reached storage."""
    cols: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        body = m.group(1)
        cols.append([c.split(":")[0].strip() for c in body.split(",") if c.strip()])
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)  # one explain round-trip, not two
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of EXPLICIT ``F.broadcast()`` hints in the analyzed logical
    plan. Distinct from ``has_broadcast_join``: a hint FORCES a broadcast
    regardless of runtime size — fine on a bounded dim, an executor OOM on
    anything data-sized — while AQE-chosen broadcasts stay size-gated.
    Tests use this to assert data-sized relations are never hint-forced."""
    return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint (strategy=broadcast)")


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (BroadcastExchange excluded — a broadcast is not a repartition of
    the stream). Counts the numbered node list of explain('formatted'),
    where the node name and its hashpartitioning arguments sit on
    separate lines."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def has_partial_aggregate(df: DataFrame) -> bool:
    """Map-side combine present (HashAggregate appears in partial+final
    pairs around the exchange)."""
    plan = formatted_plan(df)
    return plan.count("HashAggregate") >= 2 or "partial_" in plan


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Count of WholeStageCodegen spans — wider/fewer is better (more
    operators fused into generated code).

    Caveat: an AQE-wrapped plan (any query with an exchange) prints
    ``isFinalPlan=false`` without codegen ids until executed, so this
    reads 0 for unexecuted adaptive plans — meaningful only for
    exchange-free queries (e.g. the scalar-pack span assertion) or after
    an action."""
    return len(set(re.findall(r"\[codegen id : (\d+)\]", formatted_plan(df))))


def scan_tables(df: DataFrame) -> list[str]:
    """Parquet scans present in the plan (by file path tail)."""
    return re.findall(r"Scan parquet[^\n]*", formatted_plan(df))
