"""Z-order clustering: multi-column pruning through LakeTable stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_spark.operators.zorder import zorder_layout, zvalue
from data_engineering_spark.sources.txlog import LakeTable


def _df(spark):
    # two independent uniform columns (a 100x100 grid) — the case a
    # linear sort can't serve
    return spark.range(10000).select(
        F.col("id"),
        (F.col("id") % 100).alias("a"),
        ((F.col("id") / 100).cast("long") % 100).alias("b"),
    )


def test_zvalue_locality(spark):
    out = zvalue(_df(spark), ["a", "b"]).orderBy("__zval__").collect()
    # z-neighbors are close in BOTH dimensions: max per-step jump is
    # bounded (Morton curve property), far below random shuffling
    steps = [
        max(abs(x.a - y.a), abs(x.b - y.b)) for x, y in zip(out[:-1], out[1:])
    ]
    assert sum(s <= 50 for s in steps) / len(steps) > 0.95


def test_zvalue_wide_column_sets_stay_in_63_bits(spark):
    """bits=16 with 4+ columns would interleave into the long's sign bit,
    flipping the order of high z-values; the cap must keep every z-value
    non-negative and the ordering monotone in each column's rank."""
    df = spark.range(4096).select(
        F.col("id"),
        (F.col("id") % 8).alias("a"),
        ((F.col("id") / 8).cast("long") % 8).alias("b"),
        ((F.col("id") / 64).cast("long") % 8).alias("c"),
        ((F.col("id") / 512).cast("long") % 8).alias("d"),
    )
    out = zvalue(df, ["a", "b", "c", "d"], bits=16)
    assert out.filter(F.col("__zval__") < 0).count() == 0
    # the all-max corner must carry the largest z-value (sign overflow
    # used to make it the SMALLEST)
    top = out.orderBy(F.col("__zval__").desc()).select("a", "b", "c", "d").first()
    assert (top.a, top.b, top.c, top.d) == (7, 7, 7, 7)


def test_zorder_prunes_both_columns(spark, tmp_path):
    df = _df(spark)
    zt = LakeTable(spark, str(tmp_path / "z"))
    zt.create(zorder_layout(df, ["a", "b"], num_files=16))
    lt = LakeTable(spark, str(tmp_path / "lin"))
    lt.create(df.repartitionByRange(16, "a").sortWithinPartitions("a"))

    za, _ = zt.pruned_files([("a", ">=", 90)])
    zb, _ = zt.pruned_files([("b", ">=", 90)])
    la, _ = lt.pruned_files([("a", ">=", 90)])
    lb, total = lt.pruned_files([("b", ">=", 90)])
    # linear layout: great on the sort column, useless on the other
    assert la <= 3
    assert lb == total
    # z-order: substantial pruning on BOTH columns
    assert za <= total // 2
    assert zb <= total // 2
    # pruning never changes results
    assert zt.scan(filters=[("b", ">=", 90)]).count() == df.filter("b >= 90").count()
    # a conjunctive box filter prunes to a small corner
    zboth, _ = zt.pruned_files([("a", ">=", 90), ("b", ">=", 90)])
    assert zboth <= total // 4


def test_zorder_approx_matches_window_pruning(spark, tmp_path):
    """The shuffle-free approx-quantile bucketizer (the warehouse path)
    must cluster as effectively as the exact window ranking."""
    df = _df(spark)
    t = LakeTable(spark, str(tmp_path / "za"))
    t.create(zorder_layout(df, ["a", "b"], num_files=16, bits=10, method="approx"))
    ka, total = t.pruned_files([("a", ">=", 90)])
    kb, _ = t.pruned_files([("b", ">=", 90)])
    kboth, _ = t.pruned_files([("a", ">=", 90), ("b", ">=", 90)])
    assert ka <= total // 2 and kb <= total // 2 and kboth <= total // 4
    assert t.scan(filters=[("a", ">=", 90)]).count() == df.filter("a >= 90").count()


def test_zvalue_nulls_and_nan_rank_identically_in_both_methods(spark):
    """Method parity (r11 warehouse review #6 + r12 end-of-round
    review): NULL ranks to bucket 0 and genuine NaN to the TOP bucket
    in BOTH methods — the window path's orderBy semantics (NULL first,
    NaN last). The pre-r12 approx path sent BOTH to the top bucket; the
    first r12 fix sent both to 0 — each a silent cross-method
    relocation of the affected rows across the z-range."""
    rows = [(float(i),) for i in range(1, 200)] + [(None,), (float("nan"),)]
    df = spark.createDataFrame(rows, "x double")
    for method in ("window", "approx"):
        out = zvalue(df, ["x"], bits=4, method=method).select(
            "x", "__zval__"
        )
        got = out.collect()
        null_z = [r["__zval__"] for r in got if r["x"] is None]
        import math

        nan_z = [r["__zval__"] for r in got
                 if r["x"] is not None and math.isnan(r["x"])]
        finite_max = max(r["__zval__"] for r in got
                         if r["x"] is not None and not math.isnan(r["x"]))
        assert null_z == [0], (method, null_z)
        assert len(nan_z) == 1 and nan_z[0] >= finite_max, (method, nan_z, finite_max)


def test_zvalue_approx_rejects_non_numeric_and_caps_bits(spark):
    """approxQuantile is numeric-only — a string z-order column must
    raise HERE with the alternative named, not deep in py4j; and the
    approx path caps rank resolution at 8 bits (r15; was 12 since the
    r11 warehouse review #7) so the default bits=16 never requests a
    65,535-probe GK sketch — the sketch pass dominated OPTIMIZE at 12
    bits while pruning saturates far below 256 ranks per column."""
    import pytest

    df = spark.createDataFrame([(1.0, "a")], "x double, s string")
    with pytest.raises(ValueError, match="method='window'"):
        zvalue(df, ["s"], method="approx")
    big = spark.createDataFrame([(float(i),) for i in range(500)], "x double")
    out = zvalue(big, ["x"], bits=16, method="approx")
    # one column, 8 effective bits → every z-value < 2^8
    assert out.agg(F.max("__zval__")).first()[0] < (1 << 8)
