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

from data_engineering_spark.operators.merge import apply_cdc, merge_upsert

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
