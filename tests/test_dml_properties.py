"""Property-based DML semantics: merge/CDC against a dict-replay model.

The example-based tests in test_merge.py pin the documented behaviors;
these hypothesis properties sweep the input space (key overlaps, delete/
insert/update mixes, sequence ties, null payloads) against a driver-side
reference model, the way the reference's hand-written delete-then-append
jobs were validated by reconciliation queries."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_engineering_spark.operators.merge import apply_cdc, merge_upsert, scd2_apply

KEYS = st.integers(min_value=0, max_value=6)
VALS = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))

target_rows = st.dictionaries(KEYS, VALS, max_size=5)
# one source row per key (merge contract); CDC feeds may repeat keys
source_rows = st.dictionaries(KEYS, VALS, max_size=5)
cdc_feed = st.lists(
    st.tuples(KEYS, st.sampled_from(["I", "U", "D"]), VALS), max_size=8
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _df(spark, mapping):
    rows = [(k, v) for k, v in sorted(mapping.items())]
    return spark.createDataFrame(rows, "k long, v long") if rows else (
        spark.createDataFrame([], "k long, v long")
    )


@pytest.mark.usefixtures("spark")
@given(tgt=target_rows, src=source_rows)
@_SETTINGS
def test_merge_upsert_equals_dict_update(spark, tgt, src):
    expected = dict(tgt)
    expected.update(src)  # MERGE == dict.update when source keys unique
    out = merge_upsert(_df(spark, tgt), _df(spark, src), ["k"]).collect()
    assert {r.k: r.v for r in out} == expected


@pytest.mark.usefixtures("spark")
@given(tgt=target_rows, feed=cdc_feed)
@_SETTINGS
def test_apply_cdc_equals_replay(spark, tgt, feed):
    # model: replay ops in seq order — last op per key wins
    expected = dict(tgt)
    for k, op, v in feed:  # list order == seq order
        if op == "D":
            expected.pop(k, None)
        else:
            expected[k] = v
    rows = [(k, op, v, i) for i, (k, op, v) in enumerate(feed)]
    changes = (
        spark.createDataFrame(rows, "k long, op string, v long, seq long")
        if rows
        else spark.createDataFrame([], "k long, op string, v long, seq long")
    )
    out = apply_cdc(_df(spark, tgt), changes, ["k"], op_col="op", seq_col="seq")
    assert {r.k: r.v for r in out.collect()} == expected


scd2_batches = st.lists(
    st.dictionaries(KEYS, st.sampled_from(["a", "b", "c"]), min_size=1, max_size=4),
    min_size=1,
    max_size=3,
)

_SCD2_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@pytest.mark.usefixtures("spark")
@given(batches=scd2_batches)
@_SCD2_SETTINGS
def test_scd2_sequential_batches_keep_temporal_invariants(spark, batches):
    """After any sequence of update batches: per key, exactly one current
    row; history validity ranges never overlap and chain contiguously;
    the current attribute equals the last batch that changed the key."""
    dim = spark.createDataFrame([], "k long, tier string, valid_from date, valid_to date, is_current boolean")
    latest: dict[int, str] = {}
    for day, batch in enumerate(batches, start=1):
        upd = spark.createDataFrame(sorted(batch.items()), "k long, tier string")
        # localCheckpoint: each apply joins the previous output, so the
        # un-truncated plan doubles per batch and analysis dominates
        dim = scd2_apply(dim, upd, "k", ["tier"], f"2024-06-{day:02d}").localCheckpoint()
        latest.update(batch)
    rows = dim.collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)
    assert set(by_key) == set(latest)
    for k, rs in by_key.items():
        cur = [r for r in rs if r.is_current]
        assert len(cur) == 1
        assert cur[0].tier == latest[k]
        assert str(cur[0].valid_to) == "9999-12-31"
        # ranges chain: sorted by valid_from, each close date equals the
        # next row's open date, no overlaps
        rs_sorted = sorted(rs, key=lambda r: str(r.valid_from))
        for a, b in zip(rs_sorted[:-1], rs_sorted[1:]):
            assert str(a.valid_to) == str(b.valid_from)
