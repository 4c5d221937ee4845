"""Profiling / data-quality / skew operators on planted frames."""

from __future__ import annotations

from data_engineering_spark.operators.profiling import (
    expect_accepted_values,
    expect_not_null,
    expect_referential_integrity,
    expect_unique,
    profile_columns,
    run_expectations,
    skew_report,
)


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", None), (3, None, 4.5), (3, "b", 4.5)],
        "k long, s string, v double",
    )
    p = {r.column: r for r in profile_columns(df).collect()}
    assert p["k"].n_rows == 4 and p["k"].n_nulls == 0 and p["k"].n_distinct == 3
    assert p["k"].min_num == 1.0 and p["k"].max_num == 3.0
    assert p["s"].n_nulls == 1 and p["s"].n_distinct == 2
    assert p["s"].min_num is None  # strings carry no numeric bounds
    assert p["v"].n_nulls == 1 and p["v"].min_num == 1.5 and p["v"].max_num == 4.5


def test_expectations_suite(spark):
    child = spark.createDataFrame(
        [(1, 10, "O"), (1, 10, "O"), (2, None, "X"), (3, 30, "F")],
        "id long, fk long, status string",
    )
    parent = spark.createDataFrame([(10,), (30,)], "pk long")
    out = {
        r.rule: r.violations
        for r in run_expectations(
            [
                expect_not_null(child, "fk"),
                expect_unique(child, ["id"]),
                expect_accepted_values(child, "status", ["O", "F"]),
                expect_referential_integrity(child, "fk", parent, "pk"),
            ]
        ).collect()
    }
    assert out["not_null:fk"] == 1
    assert out["unique:id"] == 1  # violations count duplicated KEYS, not rows
    assert out["accepted_values:status"] == 1
    # SQL-FK / dbt-relationships semantics (r11 review): a NULL fk is NOT
    # an orphan — nullability is expect_not_null's job, composed above
    assert out["ref_integrity:fk"] == 0


def test_referential_integrity_counts_real_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,)], "pk long")
    out = expect_referential_integrity(child, "fk", parent, "pk").collect()[0]
    assert out.violations == 1  # fk=99 only; the NULL row is excluded


def test_profile_columns_covers_decimal(spark):
    """DECIMAL columns get real numeric min/max (r11 review: DecimalType
    was missing from the numeric type set, profiling money columns as
    if they were strings)."""
    from decimal import Decimal

    from data_engineering_spark.operators.profiling import profile_columns

    df = spark.createDataFrame(
        [(Decimal("1.50"),), (Decimal("9.25"),)], "price decimal(15,2)"
    )
    row = profile_columns(df).collect()[0]
    assert row.min_num == 1.5 and row.max_num == 9.25


def test_skew_report(spark):
    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("a_cold",)] + [("b_cold",)]
    df = spark.createDataFrame(rows, "k string")
    got = skew_report(df, "k", top=3).collect()
    assert [(r.key_value, r.cnt) for r in got] == [("hot", 6), ("warm", 3), ("a_cold", 1)]
    assert abs(got[0].share - 6 / 11) < 1e-6


def test_heavy_hitters_matches_exact_on_planted_skew(spark):
    """Two-pass Misra-Gries must return EXACTLY the full-groupBy answer
    (values with cnt*(k+1) > n, exact counts) on an adversarially
    skewed, adversarially partitioned key — the pigeonhole guarantee
    pass 2 relies on."""
    from pyspark.sql import functions as F

    from data_engineering_spark.operators.profiling import heavy_hitters

    # zipf-ish: one mega key, a mid key, and a long tail of singletons
    rows = (
        [("hot",)] * 500
        + [("warm",)] * 200
        + [(f"tail{i}",) for i in range(300)]
        + [(None,)] * 400  # null keys: excluded from candidates AND total
    )
    df = spark.createDataFrame(rows, "k string").repartition(7)  # scatter the hot key
    for k in (2, 4, 8):
        got = {
            (r.value, r.cnt)
            for r in heavy_hitters(df, "k", k=k).collect()
        }
        exact = {
            (r.k, r.cnt)
            for r in df.filter(F.col("k").isNotNull())
            .groupBy("k")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .filter(F.col("cnt") * (k + 1) > 1000)
            .collect()
        }
        assert got == exact, (k, got, exact)
    # k=2 → threshold 333: only 'hot'; k=8 → threshold 111: hot+warm
    assert {v for v, _ in {
        (r.value, r.cnt) for r in heavy_hitters(df, "k", k=2).collect()
    }} == {"hot"}
    assert {v for v, _ in {
        (r.value, r.cnt) for r in heavy_hitters(df, "k", k=8).collect()
    }} == {"hot", "warm"}


def test_heavy_hitters_candidate_stage_is_map_only(spark, sf_dir):
    """The sketch pass must not shuffle: only the candidate-filtered
    exact count and the 1-row total may exchange."""
    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.operators.profiling import heavy_hitters
    from data_engineering_spark.plans.explain import shuffle_count

    out = heavy_hitters(load_table(spark, sf_dir, "orders"), "o_orderstatus", k=3)
    assert shuffle_count(out) <= 2, shuffle_count(out)


def test_column_entropy_bounds_and_extremes(spark):
    import math

    from data_engineering_spark.operators.profiling import column_entropy

    df = spark.createDataFrame(
        [(i, "const", f"u{i}", "a" if i % 2 == 0 else "b", None,
          None if i % 2 == 0 else "<null>") for i in range(64)],
        "id long, c_const string, c_unique string, c_coin string, "
        "c_null string, c_trap string",
    )
    got = {r["col"]: r for r in column_entropy(
        df, ["c_const", "c_unique", "c_coin", "c_null", "c_trap"]).collect()}
    # single-valued column: entropy exactly 0 (and NULLs profile as a value)
    assert got["c_const"]["entropy_micro"] == 0 and got["c_const"]["n_distinct"] == 1
    assert got["c_null"]["entropy_micro"] == 0 and got["c_null"]["n_distinct"] == 1
    # a REAL value spelled like a null sentinel must not merge with NULLs:
    # half NULL / half the literal string is a fair coin, not a constant
    assert got["c_trap"]["n_distinct"] == 2
    assert got["c_trap"]["entropy_micro"] == got["c_coin"]["entropy_micro"]
    # fair coin: ln 2 in 1e-6 fixed point (floor division)
    assert got["c_coin"]["entropy_micro"] == int(math.log(2) * 1e6)
    # unique column: ln N
    assert abs(got["c_unique"]["entropy_micro"] - int(math.log(64) * 1e6)) <= 1
    assert got["c_unique"]["n_distinct"] == 64
