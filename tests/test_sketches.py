"""Mergeable-sketch operators (operators/sketches.py): HLL sketch-table
build/merge and count-min frequency bounds.

The properties that make a sketch table VALID at 100 TB are exactly the
ones tested here: (1) merge algebra — answering from merged fine-grain
sketches equals answering from a direct coarse sketch; (2) partition
invariance — the estimate is a pure function of the value set, not of
how Spark happened to split the data; (3) persistence — the sketch
column survives a parquet round-trip and merges identically after
re-read (the "build once, query forever" contract); (4) the CMS
one-sided guarantee (never undercounts) and ε-bound.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.operators.sketches import (
    cms_frequency_bounds,
    hll_rollup,
    hll_rollup_estimate,
)


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _daily(ev):
    return hll_rollup(
        ev,
        [F.col("event_type"), F.to_date("ts").alias("day")],
        {"user_hll": "user_id"},
        lgk=12,
    )


def test_hll_merged_rollup_tracks_exact(spark, sf_dir):
    ev = _events(spark, sf_dir)
    merged = hll_rollup_estimate(_daily(ev), ["event_type"], ["user_hll"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact")
    )
    rows = merged.join(exact, "event_type").collect()
    assert rows
    for r in rows:
        # lgk=12 ⇒ rse ≈ 1.6 %; 5 % (and an absolute slack of 2 for tiny
        # groups) is the same 3σ bound the registered query ships
        assert abs(r["user_hll_est"] - r["exact"]) <= max(0.05 * r["exact"], 2), r


def test_hll_merge_is_partition_invariant(spark, sf_dir):
    ev = _events(spark, sf_dir)
    a = hll_rollup_estimate(_daily(ev.repartition(1)), ["event_type"], ["user_hll"])
    b = hll_rollup_estimate(_daily(ev.repartition(13)), ["event_type"], ["user_hll"])
    ra = {r["event_type"]: r["user_hll_est"] for r in a.collect()}
    rb = {r["event_type"]: r["user_hll_est"] for r in b.collect()}
    assert ra == rb


def test_hll_sketch_table_survives_parquet_round_trip(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    table = _daily(ev)
    path = os.path.join(str(tmp_path), "sketch_table")
    table.write.parquet(path)
    reread = spark.read.parquet(path)
    direct = {
        r["event_type"]: r["user_hll_est"]
        for r in hll_rollup_estimate(table, ["event_type"], ["user_hll"]).collect()
    }
    from_disk = {
        r["event_type"]: r["user_hll_est"]
        for r in hll_rollup_estimate(reread, ["event_type"], ["user_hll"]).collect()
    }
    assert direct == from_disk


def test_hll_range_merge_equals_direct_range_sketch(spark, sf_dir):
    """The sketch-table USE CASE: a date-range distinct count answered by
    merging only that range's cells must match a direct sketch built over
    the same range's raw rows."""
    ev = _events(spark, sf_dir)
    days = [r["day"] for r in ev.select(F.to_date("ts").alias("day")).distinct().orderBy("day").collect()]
    cut = days[len(days) // 2]
    table = _daily(ev)
    merged = (
        table.filter(F.col("day") <= F.lit(cut))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("user_hll")).cast("long").alias("est"))
        .collect()[0]["est"]
    )
    direct = (
        ev.filter(F.to_date("ts") <= F.lit(cut))
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12)))
            .cast("long")
            .alias("est")
        )
        .collect()[0]["est"]
    )
    assert merged == direct


def test_hll_upsert_equals_rebuild(spark, sf_dir):
    """The incremental-maintenance contract: sketching an append batch
    and cell-wise unioning it into the existing table must equal a full
    rebuild from all raw rows — exactly, because union is register max."""
    from data_engineering_spark.operators.sketches import hll_rollup_upsert

    ev = _events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    days = sorted(r["day"] for r in ev.select("day").distinct().collect())
    cut = days[len(days) * 2 // 3]
    old, batch = ev.filter(F.col("day") <= F.lit(cut)), ev.filter(F.col("day") > F.lit(cut))
    table = hll_rollup(old, ["event_type", "day"], {"user_hll": "user_id"})
    upserted = hll_rollup_upsert(table, batch, ["event_type", "day"], {"user_hll": "user_id"})
    rebuilt = hll_rollup(ev, ["event_type", "day"], {"user_hll": "user_id"})

    def roll(t):
        return {
            r["event_type"]: (r["user_hll_est"], r["n_rows"])
            for r in hll_rollup_estimate(t, ["event_type"], ["user_hll"]).collect()
        }

    assert roll(upserted) == roll(rebuilt)
    assert upserted.count() == rebuilt.count()  # same cell set


def test_hll_upsert_from_lake_cdf(spark, sf_dir, tmp_path):
    """The full incremental loop at 100 TB: the raw data lives in a
    logged lake table, the ingest appends a batch, and the sketch table
    is maintained by feeding ONLY the change feed's added rows through
    hll_rollup_upsert — never rescanning history. The result must equal
    a rebuild over the table's full scan."""
    import os as _os

    from data_engineering_spark.operators.sketches import hll_rollup_upsert
    from data_engineering_spark.sources.txlog import LakeTable

    ev = (
        _events(spark, sf_dir)
        .withColumn("day", F.to_date("ts"))
        .select("event_id", "event_type", "day", "user_id")
    )
    days = sorted(r["day"] for r in ev.select("day").distinct().collect())
    cut = days[len(days) * 2 // 3]
    t = LakeTable(spark, _os.path.join(str(tmp_path), "lake"))
    t.create(ev.filter(F.col("day") <= F.lit(cut)))
    table = hll_rollup(t.scan(), ["event_type", "day"], {"user_hll": "user_id"})
    # materialize the pre-append sketch table the way production would
    # (it persists as parquet; the upsert then reads the stored cells)
    spath = _os.path.join(str(tmp_path), "sketch_table")
    table.write.parquet(spath)
    v0 = t.latest_version()
    t.append(ev.filter(F.col("day") > F.lit(cut)))

    changes = t.version_changes(v0, None, ["event_id"])
    added = changes.filter(F.col("change") == "added").select(
        F.col("new_event_type").alias("event_type"),
        F.col("new_day").alias("day"),
        F.col("new_user_id").alias("user_id"),
    )
    upserted = hll_rollup_upsert(
        spark.read.parquet(spath), added, ["event_type", "day"], {"user_hll": "user_id"}
    )
    rebuilt = hll_rollup(t.scan(), ["event_type", "day"], {"user_hll": "user_id"})

    def roll(tbl):
        return {
            r["event_type"]: (r["user_hll_est"], r["n_rows"])
            for r in hll_rollup_estimate(tbl, ["event_type"], ["user_hll"]).collect()
        }

    assert roll(upserted) == roll(rebuilt)
    # and the feed was append-pruned: no removed/changed rows exist
    assert changes.filter(F.col("change") != "added").count() == 0


def test_cms_bounds_hold_and_estimates_deterministic(spark, sf_dir):
    ev = _events(spark, sf_dir)
    out = cms_frequency_bounds(ev, "event_type", eps=0.001, confidence=0.99, seed=42)
    rows = out.collect()
    assert rows
    for r in rows:
        assert r["cms_lower_ok"] is True, r
        assert r["cms_upper_ok"] is True, r
    # pure function of the multiset: a different partitioning yields the
    # same estimates cell-for-cell
    again = {
        r["event_type"]: r["cms_est"]
        for r in cms_frequency_bounds(
            ev.repartition(13), "event_type", eps=0.001, confidence=0.99, seed=42
        ).collect()
    }
    first = {r["event_type"]: r["cms_est"] for r in rows}
    assert first == again


def test_hist_merge_equals_direct_and_quantiles_bracket_truth(spark, sf_dir):
    """Bin counts add exactly, so quantiles from merged daily cells must
    equal a direct single-grain histogram; and each p<q>_lo must bracket
    the true order statistic within one bin width (the deterministic
    resolution contract)."""
    from data_engineering_spark.operators.sketches import hist_quantiles, hist_rollup

    ev = _events(spark, sf_dir).filter(F.col("event_type").isNotNull())
    cents = F.round(F.col("value") * 100).cast("long")
    daily = hist_rollup(ev, [F.col("event_type"), F.to_date("ts").alias("day")], cents, 250)
    direct = hist_rollup(ev, [F.col("event_type")], cents, 250)
    from_daily = {
        r["event_type"]: (r["p50_lo"], r["p90_lo"], r["p99_lo"], r["n"])
        for r in hist_quantiles(daily, ["event_type"], 250, [50, 90, 99]).collect()
    }
    from_direct = {
        r["event_type"]: (r["p50_lo"], r["p90_lo"], r["p99_lo"], r["n"])
        for r in hist_quantiles(direct, ["event_type"], 250, [50, 90, 99]).collect()
    }
    assert from_daily == from_direct
    # the estimator's exact contract: p90_lo is the lower edge of the
    # bin holding the ceil(0.9 n)-th smallest value
    import math

    vals: dict[str, list[int]] = {}
    for r in ev.select("event_type", cents.alias("vc")).collect():
        vals.setdefault(r["event_type"], []).append(r["vc"])
    for et, (_, p90_lo, _, n) in from_daily.items():
        vs = sorted(vals[et])
        assert n == len(vs)
        kth = vs[math.ceil(0.9 * n) - 1]
        assert p90_lo <= kth < p90_lo + 250, (et, p90_lo, kth)


def test_hist_negative_values_floor_bin(spark):
    """floor(v / width) must bin negatives toward -inf (matching SQL
    floor division), not truncate toward zero."""
    from data_engineering_spark.operators.sketches import hist_quantiles, hist_rollup

    df = spark.createDataFrame([(-501,), (-250,), (-1,), (0,), (249,)], "v long")
    h = hist_rollup(df.withColumn("k", F.lit("a")), ["k"], "v", 250)
    bins = {r["bin"]: r["cnt"] for r in h.collect()}
    assert bins == {-3: 1, -1: 2, 0: 2}
    q = hist_quantiles(h, ["k"], 250, [50]).collect()[0]
    # n=5, cum>=3 first reached in bin -1 → lower edge -250
    assert q["p50_lo"] == -250 and q["n"] == 5


def test_cms_integral_key_column(spark):
    """Non-string enum keys (the docstring's status-code case) keep
    their own type in the result schema and probe the sketch through
    the same widen-to-long hash the build side used."""
    df = spark.createDataFrame(
        [(200,), (200,), (404,), (500,), (200,)], schema="status long"
    )
    rows = cms_frequency_bounds(df, "status", eps=0.01, confidence=0.99, seed=7)
    assert dict(rows.dtypes)["status"] == "bigint"
    by = {r["status"]: r for r in rows.collect()}
    assert by[200]["exact_n"] == 3
    for r in by.values():
        assert r["cms_lower_ok"] and r["cms_upper_ok"], r


def test_cms_rejects_unsupported_key_type(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1.5,), (2.5,)], schema="x double")
    with _pytest.raises(ValueError, match="unsupported key type"):
        cms_frequency_bounds(df, "x")


def test_cms_excludes_null_keys(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], schema="k string"
    )
    rows = cms_frequency_bounds(df, "k", eps=0.01, confidence=0.99, seed=7).collect()
    keys = {r["k"] for r in rows}
    assert keys == {"a", "b"}
    by = {r["k"]: r for r in rows}
    assert by["a"]["exact_n"] == 2 and by["a"]["cms_lower_ok"]
