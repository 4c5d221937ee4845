"""Join operators (SURVEY §2.3, J1-J5 + the [absent] extras).

Scale stance: dimension sides that fit in memory are explicitly
``broadcast()`` (the reference relies on Redshift/Catalyst to figure this
out; we make it deliberate). Fact-fact joins shuffle on their keys and rely
on AQE skew-join splitting (enabled in ``session.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "left_join_chain",
    "semi_join",
    "anti_join",
    "broadcast_lookup_join",
    "asof_join",
    "range_join",
    "salted_join",
]


def left_join_chain(fact: DataFrame, dims: Sequence[tuple[DataFrame, Column | str, bool]]) -> DataFrame:
    """J1 — fact LEFT OUTER JOIN dim₁ … dimₙ (reference
    ``Talent_Opportunity_Platform/Elastic_indexing.py:131-158``: t3_emp_feature
    left-joined to 3 derived tables on emp_no).

    ``dims``: (dim_df, join_condition_or_key, broadcast?) triples. Small
    derived dims are broadcast so the fact never shuffles for them.
    """
    out = fact
    for dim, on, do_broadcast in dims:
        d = F.broadcast(dim) if do_broadcast else dim
        out = out.join(d, on=on, how="left")
    return out


def semi_join(left: DataFrame, right: DataFrame, on: Column | str) -> DataFrame:
    """J3 — membership-only inner join upgraded to ``left_semi``
    (reference ``Keyword.py:175-181`` joins ``emp_pre`` purely for
    filtering; semi-join avoids materializing the right side's columns and
    lets Spark build a broadcast hash set)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Column | str) -> DataFrame:
    """[absent in reference] NOT EXISTS — ``left_anti`` built-in."""
    return left.join(right, on=on, how="left_anti")


def broadcast_lookup_join(
    hits: DataFrame, lookup: DataFrame, on: Column | str, how: str = "left"
) -> DataFrame:
    """J4 — the client-side nested-loop lookup (reference
    ``Openapi/openai_elasticsearch.py:224-292``: per top hit, fetch the
    matching doc from a second index by emp_no and merge fields) as a
    broadcast hash join: one pass, no driver loop, no per-row RPC."""
    return hits.join(F.broadcast(lookup), on=on, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """[absent in reference] as-of join: for each left row, the latest
    right row with ``right_ts <= left_ts`` (backward) or earliest with
    ``>=`` (forward), per key.

    Implementation: range-condition join + per-left-row window top-1.
    Both sides shuffle once on ``key``; the window reuses the join's
    partitioning (no second shuffle). At 100 TB the range condition keeps
    the join selective; for dense right sides a bucketed/sorted layout
    turns this into a sort-merge join.
    """
    from pyspark.sql import Window

    lcols = [F.col(f"l.{c}").alias(c) for c in left.columns]
    cond = (F.col(f"l.{key}") == F.col(f"r.{key}")) & (
        (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
        if direction == "backward"
        else (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
    )
    rpayload = [c for c in right.columns if c != key]
    joined = left.alias("l").join(right.alias("r"), cond, "left")
    order = F.col(f"r.{right_ts}").desc() if direction == "backward" else F.col(f"r.{right_ts}").asc()
    w = Window.partitionBy(*[F.col(f"l.{c}") for c in left.columns]).orderBy(order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*lcols, *[F.col(f"r.{c}").alias(f"r_{c}") for c in rpayload])
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    how: str = "inner",
    broadcast_right: bool = True,
) -> DataFrame:
    """[absent in reference] point-in-interval join. With a small interval
    table the broadcast turns O(n·m) into a broadcast-nested-loop that never
    shuffles the big side."""
    r = F.broadcast(right) if broadcast_right else right
    cond = (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) < F.col(right_hi))
    return left.join(r, cond, how)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on_large: str,
    on_small: str,
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Skew-buster join: replicate the small side ``salts``× and scatter
    the large side's hot keys across (key, salt) sub-partitions.

    AQE's skew-join splitting (on in session.py) handles most skew at
    runtime; this explicit variant is for the pathological case AQE can't
    fix — a single join key carrying a double-digit percent of the fact —
    or for engines/stages where AQE is off (e.g., inside streaming
    foreachBatch). The salt is a deterministic hash of the large row's
    full column tuple, so re-runs produce identical partitioning (no
    rand(): nondeterministic salts break task retries at scale).

    Cost model: small side grows ``salts``×, large side never duplicates —
    the right trade when |small| ≪ |large| and the skew is on the large
    side's key distribution."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salts)).cast("int")
    l = large.withColumn("_salt", salt)
    s = small.withColumn("_salt_s", F.explode(F.array(*[F.lit(i) for i in range(salts)])))
    out = l.join(
        s, (F.col(on_large) == F.col(on_small)) & (F.col("_salt") == F.col("_salt_s")), how
    )
    return out.drop("_salt", "_salt_s")
