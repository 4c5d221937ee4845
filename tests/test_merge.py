"""Keyed mutation operators: MERGE, CDC apply, SCD2."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_spark.operators.merge import apply_cdc, merge_upsert, scd2_apply


def test_merge_update_insert_passthrough(spark):
    tgt = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], ["k", "name", "v"])
    src = spark.createDataFrame([(2, "B", 99), (3, "c", 30)], ["k", "name", "v"])
    out = {r.k: (r.name, r.v) for r in merge_upsert(tgt, src, ["k"]).collect()}
    assert out == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30)}


def test_merge_null_payload_still_updates(spark):
    # a source row whose payload is entirely NULL must still overwrite
    # (the presence flag, not the payload, decides matched-ness)
    tgt = spark.createDataFrame([(1, "a")], ["k", "name"])
    src = spark.createDataFrame([(1, None)], "k long, name string")
    out = merge_upsert(tgt, src, ["k"]).collect()
    assert out[0].name is None


def test_merge_rejects_column_mismatch(spark):
    tgt = spark.createDataFrame([(1, "a")], ["k", "name"])
    src = spark.createDataFrame([(1, "a", 2)], ["k", "name", "extra"])
    with pytest.raises(ValueError):
        merge_upsert(tgt, src, ["k"])


def test_merge_rejects_duplicate_source_keys(spark):
    """A non-unique source key would silently fan out matched target
    rows — the plan-embedded guard must fail the job instead."""
    from pyspark.errors import PySparkException

    tgt = spark.createDataFrame([(1, "a")], ["k", "name"])
    src = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], ["k", "name"])
    with pytest.raises(PySparkException, match="multiple source rows"):
        merge_upsert(tgt, src, ["k"]).collect()
    # opt-out for callers who accept last-write-wins nondeterminism
    assert merge_upsert(tgt, src, ["k"], validate_source_keys=False).count() == 3


def test_merge_null_source_keys_insert_without_tripping_guard(spark):
    """Null-key source rows never match any target row (the join equality
    is null-unsafe), so two of them legally insert two rows — the
    duplicate-key guard must not fire on them."""
    tgt = spark.createDataFrame([(1, "a")], "k long, name string")
    src = spark.createDataFrame([(None, "x"), (None, "y"), (2, "b")], "k long, name string")
    out = merge_upsert(tgt, src, ["k"]).collect()
    assert len(out) == 4
    assert sorted(r.name for r in out) == ["a", "b", "x", "y"]
    # ...but duplicate NON-null keys still fail loudly
    from pyspark.errors import PySparkException

    dup = spark.createDataFrame([(None, "x"), (2, "b"), (2, "c")], "k long, name string")
    with pytest.raises(PySparkException, match="multiple source rows"):
        merge_upsert(tgt, dup, ["k"]).collect()


def test_cdc_latest_wins_and_delete(spark):
    tgt = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], ["k", "v"])
    ch = spark.createDataFrame(
        [
            (1, 1, "U", 11),
            (1, 2, "U", 12),  # latest for k=1
            (2, 5, "D", 0),
            (2, 4, "U", 99),  # older than the delete → delete wins
            (4, 1, "I", 40),
        ],
        ["k", "seq", "op", "v"],
    )
    out = {r.k: r.v for r in apply_cdc(tgt, ch, ["k"]).collect()}
    assert out == {1: 12, 3: 30, 4: 40}


def test_scd2_close_open_and_idempotency(spark):
    dim = spark.createDataFrame(
        [(1, "gold", "2020-01-01", "9999-12-31", True),
         (2, "silver", "2020-01-01", "9999-12-31", True)],
        ["k", "tier", "valid_from", "valid_to", "is_current"],
    ).select(
        "k", "tier",
        F.col("valid_from").cast("date"),
        F.col("valid_to").cast("date"),
        "is_current",
    )
    upd = spark.createDataFrame([(1, "platinum"), (2, "silver"), (3, "bronze")], ["k", "tier"])
    out1 = scd2_apply(dim, upd, "k", ["tier"], "2024-06-01")
    rows = {(r.k, r.is_current): r for r in out1.collect()}
    assert rows[(1, False)].tier == "gold"  # closed
    assert str(rows[(1, False)].valid_to) == "2024-06-01"
    assert rows[(1, True)].tier == "platinum"  # opened
    assert rows[(2, True)].tier == "silver"  # unchanged → untouched
    assert str(rows[(2, True)].valid_from) == "2020-01-01"
    assert rows[(3, True)].tier == "bronze"  # brand-new key
    assert len(rows) == 4
    # re-applying the same batch is a no-op (current rows already match)
    out2 = scd2_apply(out1, upd, "k", ["tier"], "2024-07-01")
    assert sorted(map(tuple, out2.collect())) == sorted(map(tuple, out1.collect()))
