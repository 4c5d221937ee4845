"""Aggregation operators (SURVEY §2.4, A1-A8).

The headline rewrite is A5: the reference streams 300k-doc batches through a
driver-side ``defaultdict`` hash-agg (``Talent_Opportunity_Platform/
Elastic_indexing.py:226-333``) — scalars last-write-wins, arrays extend,
8 floats appended into a dense vector. Here that whole loop is ONE
distributed ``groupBy``: partial aggregation happens map-side, the merge is
Tungsten's hash aggregate, and spill-to-disk replaces the manual 300k
flushes. That is the difference between "fits on the driver" and "works at
100 TB".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import listagg_distinct

__all__ = [
    "salted_listagg_distinct",
    "listagg_distinct_by",
    "last_wins_merge",
    "assemble_vector",
    "distinct_sorted",
    "grouped_pivot",
    "incremental_agg_merge",
]


def listagg_distinct_by(
    df: DataFrame, keys: Sequence[str], value: str, out: str, sep: str = ","
) -> DataFrame:
    """A1 — ``listagg(distinct value, sep) group by keys`` (reference
    ``Elastic_indexing.py:133-147``). Map-side partial collect_set keeps
    shuffle payload to the distinct sets, not the raw rows."""
    return df.groupBy(*keys).agg(listagg_distinct(value, sep).alias(out))


def last_wins_merge(
    df: DataFrame,
    key: str,
    order_col: str,
    scalar_cols: Sequence[str],
    array_csv_cols: Sequence[str] = (),
    sep: str = ",",
) -> DataFrame:
    """A5 — the driver-loop hash-agg as a distributed groupBy.

    Reference semantics (``Elastic_indexing.py:262-328``): per key, scalar
    fields take the *last seen* value (file line order), CSV-array fields
    concatenate-and-extend. File order is not reproducible in a distributed
    read, so we make the tiebreaker explicit: ``max_by(col, order_col)``
    (SURVEY §7 risk 3). Array fields become
    flatten(collect_list(split(csv))) with a deterministic sort.

    ``max_by``'s ORDER key is ``struct(order_col, col)``, not the bare
    order column: two rows tying on order_col would otherwise resolve to
    whichever partial-aggregate merge order the shuffle happened to
    produce — output nondeterministic BETWEEN RUNS, the forbidden class
    (FLOATS.md; r12 aggregation review). With the struct key, ties
    resolve to the max value — arbitrary but pinned.

    NULL-order semantics changed WITH that fix, deliberately: bare
    ``max_by`` ignores rows whose ordering value is NULL (an
    all-NULL-order group yielded NULL even though rows exist), while a
    struct containing a NULL field is itself non-null, so every row now
    participates — NULL order sorts below any real order (struct field
    comparison, nulls first), and an all-NULL-order group returns the
    deterministic max value instead of NULL. Rows that exist should
    surface A value; "we don't know the order" is not "there is no
    data" (pinned in tests/test_joins.py).
    """
    aggs: list[Column] = [
        F.max_by(F.col(c), F.struct(F.col(order_col), F.col(c))).alias(c)
        for c in scalar_cols
    ]
    for c in array_csv_cols:
        aggs.append(
            F.array_sort(F.flatten(F.collect_list(F.split(F.col(c), sep)))).alias(c)
        )
    return df.groupBy(key).agg(*aggs)


def assemble_vector(cols: Sequence[str], default: float = 0.0) -> Column:
    """A6 — dense-vector assembly: f01..f08 scores (NULL → 0.0) into an
    8-dim array (reference ``Elastic_indexing.py:257-258,274-313``).
    Pure column expression — codegen'd, no UDF."""
    return F.array(*[F.coalesce(F.col(c), F.lit(default)) for c in cols])


def distinct_sorted(df: DataFrame, col: str) -> DataFrame:
    """A7 — distinct values, ordered (reference collects date folders into a
    ``set`` then ``sorted(list(...))``, ``BkupRs.py:66,183-189``)."""
    return df.select(col).distinct().orderBy(col)


def grouped_pivot(
    df: DataFrame,
    key: str,
    pivot_col: str,
    pivot_values: Sequence[str],
    agg: Column,
) -> DataFrame:
    """U1 idiomatic collapse — the reference computes per-branch group-bys
    and glues them with UNION ALL + downstream merge
    (``Elastic_indexing.py:133-147``); a single ``groupBy().pivot()`` does
    it in one shuffle. Explicit ``pivot_values`` avoids the extra
    distinct-values job at scale."""
    return df.groupBy(key).pivot(pivot_col, list(pivot_values)).agg(agg)


def salted_listagg_distinct(
    df: DataFrame,
    key: str,
    value: str,
    salts: int = 8,
    sep: str = ",",
) -> DataFrame:
    """Two-phase listagg(distinct) for skewed keys: phase 1 collects
    per-(key, salt) partial sets — the hot key's values split across
    ``salts`` reducers instead of landing on one — phase 2 merges the
    (few, already-deduplicated) partial sets per key and canonicalizes
    with a sort.

    collect_set is an object aggregate, so AQE's skew-join splitting
    doesn't help it; a single key holding a large fraction of the fact
    serializes on one task in the plain one-phase form. The salt is a
    deterministic hash of the value column — same value always lands on
    the same salt, so partial sets stay disjoint-ish and re-runs are
    stable."""
    salt = F.pmod(F.xxhash64(F.col(value).cast("string")), F.lit(salts)).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.collect_set(value).alias("_vals"))
    )
    return partial.groupBy(key).agg(
        F.array_join(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("_vals")))), sep
        ).alias("listagg")
    )


def incremental_agg_merge(
    summary: DataFrame,
    batch_summary: DataFrame,
    keys: Sequence[str],
    merge_fns: dict[str, str] | None = None,
) -> DataFrame:
    """Incremental materialized-view refresh for distributive aggregates:
    merge a maintained per-key summary with a new batch's summary by
    re-aggregating their union — counts and sums add, min/max re-min/max;
    derived ratios (avg) must be recomputed downstream from sum/count.

    ``merge_fns`` maps measure column → ``"sum" | "min" | "max"``;
    unlisted measures merge by SUM (counts as counts, sums as sums).

    The batch-side cost is O(|batch|) + one shuffle of the (small)
    summary keys — at warehouse scale this is the difference between
    touching a day of data and recomputing a year. Column contract:
    both frames carry identical (keys + measure) columns. See the
    ``mv_incremental_refresh`` registry query for the full-recompute
    equivalence check."""
    _FNS = {"sum": F.sum, "min": F.min, "max": F.max}
    merge_fns = merge_fns or {}
    bad = {c: fn for c, fn in merge_fns.items() if fn not in _FNS}
    if bad:
        raise ValueError(f"incremental_agg_merge: unsupported merge fns {bad}")
    measures = [c for c in summary.columns if c not in keys]
    unknown = sorted(set(merge_fns) - set(measures))
    if unknown:
        # a typo'd column name would otherwise be ignored and the REAL
        # column silently merged by the SUM default — a min/max summary
        # corrupted additively with no error (r12 aggregation review)
        raise ValueError(
            f"incremental_agg_merge: merge_fns names non-measure columns "
            f"{unknown}; measures are {sorted(measures)}"
        )
    merged = summary.unionByName(batch_summary)
    return merged.groupBy(*keys).agg(
        *[_FNS[merge_fns.get(c, "sum")](c).alias(c) for c in measures]
    )
