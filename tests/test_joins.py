"""Join-operator semantics: as-of direction, range containment."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_engineering_spark.operators.joins import asof_join, range_join


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_backward_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (2, 100, _ts(12)), (3, 200, _ts(9))], ["id", "k", "ts"]
    )
    right = spark.createDataFrame(
        [(100, _ts(9), "a"), (100, _ts(11), "b"), (200, _ts(10), "c")], ["k", "rts", "val"]
    )
    out = {r.id: r.r_val for r in asof_join(left, right, "k", "ts", "rts").collect()}
    assert out[1] == "a"  # 10:00 → latest right ≤ 10:00 is 09:00/a
    assert out[2] == "b"  # 12:00 → 11:00/b
    assert out[3] is None  # 09:00 → nothing at or before


def test_asof_forward(spark):
    left = spark.createDataFrame([(1, 100, _ts(10))], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [(100, _ts(9), "past"), (100, _ts(11), "next")], ["k", "rts", "val"]
    )
    out = asof_join(left, right, "k", "ts", "rts", direction="forward").collect()
    assert out[0].r_val == "next"


def test_asof_null_rows_never_match(spark):
    """SQL ASOF NULL semantics (r11 review): a right row with NULL ts or
    NULL key never matches (the old NULLS-FIRST sort carried its payload
    into every left row); a left row with NULL key/ts emits NULL
    payloads instead of matching the NULL-key right partition."""
    from pyspark.sql import types as T

    lschema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("k", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    rschema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("rts", T.TimestampType()),
            T.StructField("val", T.StringType()),
        ]
    )
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (2, None, _ts(10)), (3, 100, None)], lschema
    )
    right = spark.createDataFrame(
        [(100, None, "nullts"), (None, _ts(9), "nullkey")], rschema
    )
    out = {r.id: r.r_val for r in asof_join(left, right, "k", "ts", "rts").collect()}
    assert out == {1: None, 2: None, 3: None}
    # forward direction: NULL-ts left rows must not swallow the whole
    # following frame either
    out_f = {
        r.id: r.r_val
        for r in asof_join(left, right, "k", "ts", "rts", direction="forward").collect()
    }
    assert out_f == {1: None, 2: None, 3: None}


def test_asof_ties_break_deterministically(spark):
    """Two right rows at the identical (key, ts): backward picks the
    GREATEST payload struct, forward the least — a pure function of the
    data, not shuffle order (r11 review)."""
    left = spark.createDataFrame([(1, 100, _ts(12))], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [(100, _ts(11), "aa"), (100, _ts(11), "zz")], ["k", "rts", "val"]
    )
    for _ in range(3):
        out = asof_join(left, right, "k", "ts", "rts").collect()
        assert out[0].r_val == "zz"
        fwd = asof_join(left.withColumn("ts", F.lit(_ts(10))), right, "k", "ts", "rts",
                        direction="forward").collect()
        assert fwd[0].r_val == "aa"


def test_same_named_keys_resolve(spark):
    """salted_join and fuzzy_join on same-named keys must resolve, not
    raise AMBIGUOUS_REFERENCE (r11 review, previously reproduced)."""
    from data_engineering_spark.operators.joins import fuzzy_join, salted_join

    facts = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "a"])
    dims = spark.createDataFrame([(1, "dim1")], ["k", "b"])
    got = salted_join(facts, dims.withColumnRenamed("k", "k"), "k", "k").collect()
    assert len(got) == 1 and got[0].b == "dim1"
    l = spark.createDataFrame([("kitten",)], ["name"])
    r = spark.createDataFrame([("sitten",)], ["name"])
    fz = fuzzy_join(l, r, "name", "name", max_dist=1).collect()
    assert len(fz) == 1 and fz[0].edit_dist == 1


def test_salted_join_shared_lineage_resolves(spark):
    """salted_join where both sides derive from the SAME source frame
    (self-join lineage) must resolve — df[col] indexing hits Spark's
    self-join ambiguity there, the exact case fuzzy_join's alias
    qualification handles (r11 advice)."""
    from data_engineering_spark.operators.joins import salted_join

    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    large = base.select("k", "v")
    small = base.groupBy("k").agg(F.first("v").alias("w"))
    out = salted_join(large, small, "k", "k", salts=3)
    rows = {r[0]: r[-1] for r in out.collect()}
    assert rows == {1: "a", 2: "b", 3: "c"}


def test_range_join_point_in_interval(spark):
    points = spark.createDataFrame([(1, 5), (2, 15), (3, 25)], ["id", "v"])
    intervals = spark.createDataFrame(
        [(0, 10, "low"), (10, 20, "mid")], ["lo", "hi", "bucket"]
    )
    out = {r.id: r.bucket for r in range_join(points, intervals, "v", "lo", "hi").collect()}
    assert out == {1: "low", 2: "mid"}  # 25 matches nothing → dropped (inner)


def test_salted_join_matches_plain_join(spark):
    from data_engineering_spark.operators.joins import salted_join

    # one pathologically hot key (90% of the fact) + a long tail
    fact = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(k, k * 10) for k in range(2, 102)],
        ["k", "payload"],
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(1, 102)], ["dk", "attr"])
    plain = fact.join(dim, fact.k == dim.dk).select("k", "payload", "attr")
    salted = salted_join(fact, dim, "k", "dk", salts=4).select("k", "payload", "attr")
    assert plain.count() == salted.count() == 1000
    assert plain.exceptAll(salted).isEmpty() and salted.exceptAll(plain).isEmpty()


def test_salted_join_left_outer_keeps_unmatched(spark):
    from data_engineering_spark.operators.joins import salted_join

    fact = spark.createDataFrame([(1, "a"), (2, "b"), (99, "zz")], ["k", "v"])
    dim = spark.createDataFrame([(1, "x"), (2, "y")], ["dk", "w"])
    out = salted_join(fact, dim, "k", "dk", how="left", salts=3)
    rows = {r.k: r.w for r in out.collect()}
    assert rows == {1: "x", 2: "y", 99: None}


def test_salted_listagg_matches_plain(spark):
    from data_engineering_spark.functions.scalar import listagg_distinct
    from data_engineering_spark.operators.aggregations import salted_listagg_distinct

    # hot key 1 carries 500 rows over 40 distinct values; tail keys small
    rows = [(1, f"v{i % 40}") for i in range(500)] + [(k, f"x{k}") for k in range(2, 30)]
    df = spark.createDataFrame(rows, ["k", "v"])
    plain = {
        r.k: r.agg
        for r in df.groupBy("k").agg(listagg_distinct("v").alias("agg")).collect()
    }
    salted = {r.k: r.listagg for r in salted_listagg_distinct(df, "k", "v", salts=4).collect()}
    assert plain == salted


def test_asof_payload_fields_come_from_same_row(spark):
    """A NULL field in the matched right row must stay NULL — carrying
    payload columns independently would backfill it from an older right
    row, emitting a combined row that never existed."""
    left = spark.createDataFrame([(1, 100, _ts(12))], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [(100, _ts(9), "old_a", "old_b"), (100, _ts(11), "new_a", None)],
        ["k", "rts", "a", "b"],
    )
    row = asof_join(left, right, "k", "ts", "rts").collect()[0]
    assert row.r_a == "new_a"
    assert row.r_b is None  # NOT "old_b"


def test_salted_join_rejects_outer_how(spark):
    import pytest

    from data_engineering_spark.operators.joins import salted_join

    fact = spark.createDataFrame([(1, "a")], ["k", "v"])
    dim = spark.createDataFrame([(1, "x")], ["dk", "w"])
    for how in ("right", "full", "left_anti"):
        with pytest.raises(ValueError):
            salted_join(fact, dim, "k", "dk", how=how)


def test_fuzzy_join_resolves_and_rejects(spark):
    from data_engineering_spark.operators.joins import fuzzy_join

    clean = spark.createDataFrame([("alpha",), ("beta",), ("gamma",)], ["name"])
    dirty = spark.createDataFrame([("alpka",), ("betaa",), ("zzzzz",)], ["q"])
    out = {(r.q, r.name): r.edit_dist for r in fuzzy_join(dirty, clean, "q", "name").collect()}
    assert out == {("alpka", "alpha"): 1, ("betaa", "beta"): 1}  # zzzzz unmatched


def test_incremental_agg_merge_equals_full(spark):
    from data_engineering_spark.operators.aggregations import incremental_agg_merge
    from pyspark.sql import functions as F

    rows = [(k, float(v)) for k in (1, 2, 3) for v in range(1, 6)]
    df = spark.createDataFrame(rows, "k long, v double")

    def summ(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).cast("long").alias("cnt"), F.sum("v").alias("s")
        )

    base = summ(df.filter("v <= 2"))
    batch = summ(df.filter("v > 2"))  # all keys overlap
    extra = summ(spark.createDataFrame([(9, 1.0)], "k long, v double"))  # new key
    merged = incremental_agg_merge(incremental_agg_merge(base, batch, ["k"]), extra, ["k"])
    got = {r.k: (r.cnt, r.s) for r in merged.collect()}
    assert got == {1: (5, 15.0), 2: (5, 15.0), 3: (5, 15.0), 9: (1, 1.0)}


def test_incremental_agg_merge_min_max(spark):
    """min/max measures merge by re-min/re-max, not SUM (the docstring's
    promise); unknown merge fns are rejected up front."""
    import pytest
    from data_engineering_spark.operators.aggregations import incremental_agg_merge
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(k, float(v)) for k in (1, 2) for v in range(1, 7)], "k long, v double"
    )

    def summ(d):
        return d.groupBy("k").agg(
            F.sum("v").alias("s"), F.min("v").alias("lo"), F.max("v").alias("hi")
        )

    merged = incremental_agg_merge(
        summ(df.filter("v <= 3")),
        summ(df.filter("v > 3")),
        ["k"],
        merge_fns={"lo": "min", "hi": "max"},
    )
    full = {r.k: (r.s, r.lo, r.hi) for r in summ(df).collect()}
    got = {r.k: (r.s, r.lo, r.hi) for r in merged.collect()}
    assert got == full == {1: (21.0, 1.0, 6.0), 2: (21.0, 1.0, 6.0)}
    with pytest.raises(ValueError, match="unsupported merge fns"):
        incremental_agg_merge(summ(df), summ(df), ["k"], merge_fns={"s": "avg"})


def test_last_wins_merge_deterministic_on_order_ties(spark):
    """Two rows tying on order_col must resolve identically on every run
    and layout — the bare max_by(col, order_col) left tie resolution to
    shuffle merge order (r12 aggregation review); the struct key pins it
    to the max value."""
    from data_engineering_spark.operators.aggregations import last_wins_merge

    rows = [(1, 10, "b"), (1, 10, "a"), (1, 5, "z"), (2, 7, "q")]
    df = spark.createDataFrame(rows, "k long, ord long, name string")
    expected = {1: "b", 2: "q"}  # tie at ord=10 resolves to max value
    for layout in (df, df.repartition(7), df.coalesce(1), df.orderBy(F.col("name").desc())):
        got = {r.k: r.name for r in last_wins_merge(layout, "k", "ord", ["name"]).collect()}
        assert got == expected


def test_incremental_agg_merge_rejects_unknown_measure(spark):
    """A typo'd merge_fns column must raise, not silently SUM-merge the
    real column (r12 aggregation review)."""
    import pytest
    from data_engineering_spark.operators.aggregations import incremental_agg_merge

    df = spark.createDataFrame([(1, 2.0)], "k long, lo double")
    with pytest.raises(ValueError, match="non-measure"):
        incremental_agg_merge(df, df, ["k"], merge_fns={"low": "min"})


def test_last_wins_merge_null_order_rows_participate(spark):
    """Documented NULL-order contract: rows with NULL order_col sort
    below any real order (struct-field comparison, nulls first), and an
    all-NULL-order group returns the deterministic max value rather
    than NULL — rows that exist surface a value."""
    from data_engineering_spark.operators.aggregations import last_wins_merge

    rows = [(1, None, "only_null_a"), (1, None, "only_null_b"),
            (2, None, "nullish"), (2, 5, "real")]
    df = spark.createDataFrame(rows, "k long, ord long, name string")
    got = {r.k: r.name for r in last_wins_merge(df, "k", "ord", ["name"]).collect()}
    assert got == {1: "only_null_b", 2: "real"}
