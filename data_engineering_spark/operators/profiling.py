"""Table profiling, data-quality expectations, and skew reporting.

The operational layer around a warehouse: the reference audits loads
with a single row count (``AWS_GLUE_ETL.py:134-140`` count-after-write;
SURVEY A4) — these operators are that idea grown up, in the shape of
dbt tests / Deequ checks (public designs):

- ``profile_columns`` — one aggregation pass over the table emitting a
  long-format profile row per column (nulls, distincts, numeric
  min/max). One shuffle, partial-agg friendly.
- ``expect_*`` — each expectation reduces to a violation COUNT (zero =
  pass), so a whole rule suite unions into one tiny DataFrame that a
  scheduler can alert on. Rules never move data: they aggregate or
  anti-join and count.
- ``skew_report`` — per-key frequency top-N with share-of-total: the
  first thing to look at before a big join at scale (the salting
  threshold in operators/joins.py:salted_join is chosen from exactly
  this histogram).

Scale note: ``profile_columns(exact=True)`` uses per-column exact
distinct counts (Expand-based — one pass but width × rows); at corpus
scale flip ``exact=False`` for HLL sketches (approx_count_distinct),
which is what you'd schedule nightly. The oracle checks the exact form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "profile_columns",
    "expect_not_null",
    "expect_unique",
    "expect_accepted_values",
    "expect_referential_integrity",
    "run_expectations",
    "skew_report",
    "heavy_hitters",
    "column_entropy",
]

# DecimalType included (r11 review): DECIMAL(p,s) is THE standard
# warehouse money type — omitting it made profile_columns emit NULL
# min/max for decimal columns, indistinguishable from non-numeric ones
_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(df: DataFrame, cols: list[str] | None = None, exact: bool = True) -> DataFrame:
    """Long-format column profile: (column, n_rows, n_nulls, n_distinct,
    min_num, max_num). Numeric min/max only — mixed-type min/max in one
    string column invites formatting drift; string domains are what
    ``expect_accepted_values`` is for."""
    cols = cols or df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nul_{c}"))
        aggs.append(
            (
                F.count_distinct(F.col(c))
                if exact
                else F.approx_count_distinct(F.col(c))
            ).alias(f"__dis_{c}")
        )
        if isinstance(fields[c], _NUMERIC):
            aggs.append(F.min(c).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"__max_{c}"))
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n__").cast("long").alias("n_rows"),
            F.col(f"__nul_{c}").cast("long").alias("n_nulls"),
            F.col(f"__dis_{c}").cast("long").alias("n_distinct"),
            (
                F.col(f"__min_{c}") if isinstance(fields[c], _NUMERIC) else F.lit(None).cast("double")
            ).alias("min_num"),
            (
                F.col(f"__max_{c}") if isinstance(fields[c], _NUMERIC) else F.lit(None).cast("double")
            ).alias("max_num"),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def _rule(name: str, violations: DataFrame) -> DataFrame:
    """violations: a DF whose count is the violation count — evaluated
    as a 1-row (rule, violations) aggregate, kept lazy/unioned."""
    return violations.agg(
        F.lit(name).alias("rule"), F.count(F.lit(1)).cast("long").alias("violations")
    )


def expect_not_null(df: DataFrame, col: str) -> DataFrame:
    return _rule(f"not_null:{col}", df.filter(F.col(col).isNull()))


def expect_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Violations = number of KEY VALUES that appear more than once
    (not the number of duplicated rows)."""
    dupes = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__c__"))
        .filter(F.col("__c__") > 1)
    )
    return _rule(f"unique:{','.join(cols)}", dupes)


def expect_accepted_values(df: DataFrame, col: str, values: list) -> DataFrame:
    bad = df.filter(~F.col(col).isin(values) | F.col(col).isNull())
    return _rule(f"accepted_values:{col}", bad)


def expect_referential_integrity(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Orphan check with SQL FK / dbt-relationships semantics: a NULL
    child key is NOT a violation (r11 review — the unfiltered left_anti
    counted every legitimately-nullable FK row as an orphan, alerting on
    valid data every run; dbt's relationships test filters
    ``where child is not null`` for the same reason). Pair with
    ``expect_no_nulls`` when the FK column must also be mandatory."""
    orphans = child.filter(F.col(child_key).isNotNull()).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )
    return _rule(f"ref_integrity:{child_key}", orphans)


def run_expectations(rules: list[DataFrame]) -> DataFrame:
    """Union a rule suite into one small (rule, violations) frame —
    the whole audit is one job, each rule its own partial aggregate."""
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out


def skew_report(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Top-N keys by frequency with share-of-total: the pre-join skew
    check. One partial-agg shuffle on the key; the total rides as a
    broadcast 1-row aggregate; TakeOrdered keeps only N rows moving."""
    counts = df.groupBy(F.col(key).cast("string").alias("key_value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = F.broadcast(counts.agg(F.sum("cnt").cast("double").alias("__tot__")))
    return (
        counts.join(total)
        .select(
            "key_value",
            F.col("cnt").cast("long").alias("cnt"),
            F.round(F.col("cnt") / F.col("__tot__"), 6).alias("share"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key_value"))
        .limit(top)
    )


def heavy_hitters(df: DataFrame, key: str, k: int = 8) -> DataFrame:
    """EXACT frequent items over a high-cardinality NON-NULL key WITHOUT
    a full-cardinality shuffle: two-pass distributed Misra-Gries.

    Pass 1 runs a weighted Misra-Gries summary (capacity ``k``) inside
    each scan partition via ``mapInPandas`` — bounded state, no shuffle —
    emitting each partition's surviving candidate values plus its row
    count (so the grand total needs NO extra scan). Pigeonhole
    guarantee: any value with GLOBAL count > n/(k+1) exceeds
    n_p/(k+1) in at least one partition, so it survives that
    partition's summary and reaches the candidate set. The summary is
    collected — it is ≤ (k+1)·partitions rows, the same bounded-collect
    class as the PQ codebook — and pass 2 exact-counts only the
    candidates through a broadcast semi-join, keeping values with
    ``cnt·(k+1) > n`` (an integer comparison, no float threshold). Two
    scans total; the output is EXACTLY the set a full groupBy-count +
    HAVING would produce over non-null keys — which is what the DuckDB
    oracle checks — while the one shuffle carries candidate rows, not
    the key's cardinality (a billion-cardinality key at 100 TB shuffles
    ≤ k·partitions candidates plus their rows).

    NULL keys are excluded from both the candidates and the total —
    frequency-of-missing is a data-quality question (``expect_not_null``
    / ``profile_columns``), not a heavy-hitter one, and silently
    counting nulls in the denominator while never reporting them would
    skew every share. ``skew_report`` is the exact-histogram sibling
    (one full-key shuffle, top-N); this is what replaces it when the
    key cardinality itself is the problem.
    """
    import pandas as pd

    spark = df.sparkSession

    def mg_partition(batches):
        counts: dict[str, int] = {}
        total = 0
        for pdf in batches:
            # vectorized per batch: value_counts collapses the batch to
            # its distinct values (dropping nulls), so the Python-side
            # merge is O(unique per batch)
            vc = pdf["__hh__"].value_counts()
            total += int(vc.sum())
            for v, c in vc.items():
                counts[v] = counts.get(v, 0) + int(c)
            while len(counts) > k:
                m = min(counts.values())
                counts = {v: c - m for v, c in counts.items() if c > m}
        yield pd.DataFrame(
            {"value": list(counts.keys()) + [None], "n": [0] * len(counts) + [total]}
        )

    keyed = df.select(F.col(key).cast("string").alias("__hh__")).filter(
        F.col("__hh__").isNotNull()
    )
    summary = keyed.mapInPandas(mg_partition, schema="value string, n long").collect()
    total = sum(r.n for r in summary)
    values = sorted({r.value for r in summary if r.value is not None})
    if not values or total == 0:
        return spark.createDataFrame([], "value string, cnt long, share double")
    cands = spark.createDataFrame([(v,) for v in values], "value string")
    exact = (
        keyed.join(F.broadcast(cands), keyed["__hh__"] == cands["value"], "left_semi")
        .groupBy("__hh__")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return exact.filter(F.col("cnt") * (k + 1) > F.lit(total)).select(
        F.col("__hh__").alias("value"),
        "cnt",
        F.round(F.col("cnt") / F.lit(float(total)), 6).alias("share"),
    )


def column_entropy(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column Shannon entropy of the value distribution — the
    profiling signal that separates near-constant columns (entropy → 0,
    candidates for dictionary/RLE or for dropping) from high-cardinality
    keys, which ``profile_columns``'s null/distinct counts alone miss.

    Portability contract (the DSIR fixed-point pattern): value counts
    c_v and the row count N are exact longs; the per-VALUE term
    c_v·(ln N − ln c_v) is rounded to 1e-6 fixed point once, on the
    value-domain-bounded count table, and summed as exact integers;
    entropy_micro = S_micro div N is an integral division. The ONE
    floating step left is ln itself — correctly rounded in practice in
    both the JVM and libm but not IEEE-guaranteed (unlike sqrt/div), so
    cross-engine exactness here is empirical with a bounded blast
    radius: a 1-ulp ln divergence could flip one per-value micro term
    by ±1.

    Scale shape: one row-wise explode to (column, value) pairs inside
    the scan — the ONLY table read: each row contributes exactly one
    pair per column (NULLs profile as a value), so N per column is just
    sum(c) over its count rows, computed as a window on the tiny count
    table instead of a second scan. NULLs are keyed by a separate
    is-null FLAG, never a sentinel string, so a real value can't
    collide with them.

    Exactness bound (r11 review — stated and ENFORCED, like graph.py's
    binding-constraint paragraph): each micro term must stay under 2^53
    for the double product to round exactly, and Σt under 2^63 —
    Σ c·ln(N/c) ≤ N·ln(N), so both hold comfortably for N ≤ 1e10 rows
    per column (max term < 2.4e17 sum / 9e15 per-term worst cases sit
    at N ≈ 1e10-3e11). Beyond the 1e10 gate the operator RAISES rather
    than silently wrapping int64 where DuckDB's HUGEINT would not — at
    that scale profile a sample, or shard by partition and combine
    entropies externally."""
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("col"),
                    F.coalesce(F.col(c).cast("string"), F.lit("")).alias("val"),
                    F.col(c).isNull().alias("is_null"),
                )
                for c in cols
            ]
        )
    )
    counts = (
        df.select(pairs.alias("p"))
        .select("p.col", "p.val", "p.is_null")
        .groupBy("col", "val", "is_null")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("col")
    t_expr = F.round(
        F.col("c").cast("double")
        * (
            F.log(F.col("n_rows").cast("double"))
            - F.log(F.col("c").cast("double"))
        )
        * F.lit(1e6)
    ).cast("long")
    term = counts.select(
        "col",
        F.sum("c").over(w).alias("n_rows"),
        "c",
    ).select(
        "col",
        "n_rows",
        F.when(
            F.col("n_rows") > F.lit(10_000_000_000),
            F.raise_error(
                F.lit(
                    "column_entropy: > 1e10 rows in one column — the "
                    "int64 fixed-point sum would overflow where an "
                    "oracle's int128 would not; profile a sample or "
                    "shard by partition"
                )
            ).cast("long"),
        )
        .otherwise(t_expr)
        .alias("t"),
    )
    return term.groupBy("col").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.expr("sum(t) div any_value(n_rows)").cast("long").alias("entropy_micro"),
    )
