"""Distributed perceptron quality-classifier (operators/classify.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_spark.operators.classify import (
    classifier_margins,
    hashed_features,
    train_perceptron,
)


@pytest.fixture(scope="module")
def planted(spark):
    """Linearly separable two-class corpus with disjoint planted vocab:
    'good' docs speak reference-ese, 'bad' docs speak spam-ese."""
    rows = []
    for i in range(30):
        rows.append((i, f"theorem proof citation lemma corollary v{i % 5}", 1))
    for i in range(30, 60):
        rows.append((i, f"buy cheap pills now click here w{i % 5}", -1))
    return spark.createDataFrame(rows, ["doc_id", "text", "y"])


def test_perceptron_learns_separable_corpus(planted):
    w, errors = train_perceptron(
        planted, F.col("y"), iterations=3, buckets=64
    )
    # iteration 1 starts from zero weights: every doc misclassified
    assert errors[0] == 60
    # the planted vocab is disjoint, so one update separates perfectly
    assert errors[-1] == 0
    scored = {r.doc_id: r for r in classifier_margins(planted, w, buckets=64).collect()}
    for r in planted.collect():
        assert scored[r.doc_id].margin * r.y > 0, r.doc_id
        assert scored[r.doc_id].pred == (r.y > 0)


def test_classifier_margins_total_over_all_docs(spark):
    """A doc whose every feature bucket carries zero weight (here: the
    empty doc under pruned-to-nothing weights) still scores margin 0 —
    the scorer never drops rows."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, "   ")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in classifier_margins(docs, [], buckets=64).collect()}
    assert set(out) == {1, 2, 3}
    assert all(r.margin == 0 and not r.pred for r in out.values())


def test_hashed_features_bias_and_counts(spark):
    docs = spark.createDataFrame([(7, "a a b")], ["doc_id", "text"])
    rows = hashed_features(docs, buckets=8).collect()
    by_bucket = {(r.bucket): r.cnt for r in rows}
    assert by_bucket[-1] == 1  # bias
    assert sorted(v for b, v in by_bucket.items() if b != -1) in ([1, 2], [3])
    # ([3] when 'a' and 'b' collide into one bucket at 8 buckets)


def test_training_is_layout_independent(planted):
    """Full-batch integer updates: the trained weights must not depend
    on partitioning."""
    w1, e1 = train_perceptron(planted, F.col("y"), iterations=2, buckets=64)
    w2, e2 = train_perceptron(
        planted.repartition(13), F.col("y"), iterations=2, buckets=64
    )
    assert w1 == w2 and e1 == e2


def test_operating_curve_monotone_and_total(planted):
    """Keep-counts shrink monotonically as the threshold rises, and
    every row's confusion quadrant sums to the corpus size."""
    from data_engineering_spark.operators.classify import operating_curve

    w, _ = train_perceptron(planted, F.col("y"), iterations=3, buckets=64)
    scored = classifier_margins(planted, w, buckets=64)
    labels = planted.select("doc_id", "y")
    rows = operating_curve(scored, labels, n_bins=10).orderBy("k").collect()
    assert len(rows) == 9
    n = planted.count()
    keeps = [r.tp + r.fp for r in rows]
    for r in rows:
        assert r.tp + r.fp + r.fn + r.tn == n
    assert keeps == sorted(keeps, reverse=True)
    # thresholds ride the even integer grid between min and max margin
    assert all(rows[i].threshold < rows[i + 1].threshold for i in range(8))


def test_confusion_by_group_on_separable_corpus(spark):
    """Per-group audit: the separable corpus shows 0 errors per group,
    and a planted always-wrong group shows err_micro = 1e6."""
    from data_engineering_spark.operators.classify import (
        classifier_margins,
        confusion_by_group,
        train_perceptron,
    )

    rows = []
    for i in range(20):
        rows.append((i, f"theorem proof lemma v{i % 3}", "en", 1))
    for i in range(20, 40):
        rows.append((i, f"buy cheap pills w{i % 3}", "de", -1))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "y"])
    w, _ = train_perceptron(docs, F.col("y"), iterations=3, buckets=64)
    scored = classifier_margins(docs, w, buckets=64)
    labeled = docs.select("doc_id", "lang", "y")
    out = {r.lang: r for r in confusion_by_group(scored, labeled, "lang").collect()}
    assert out["en"].err_micro == 0 and out["en"].tp == 20
    assert out["de"].err_micro == 0 and out["de"].tn == 20
    # flip the de labels: every de doc is now "misclassified"
    flipped = docs.withColumn(
        "y", F.when(F.col("lang") == "de", 1).otherwise(F.col("y"))
    ).select("doc_id", "lang", "y")
    out2 = {r.lang: r for r in confusion_by_group(scored, flipped, "lang").collect()}
    assert out2["de"].err_micro == 1_000_000 and out2["de"].fn == 20


def test_operating_curve_empty_input_is_empty(spark):
    """An empty scored⋈labels input yields an EMPTY curve (the SQL
    twin's GROUP BY over nothing), not 9 NULL-count rows from
    unpivoting a global-agg row — the r10-advice degenerate case."""
    from data_engineering_spark.operators.classify import operating_curve

    scored = spark.createDataFrame([], "doc_id long, margin long, pred boolean")
    labels = spark.createDataFrame([], "doc_id long, y long")
    out = operating_curve(scored, labels, n_bins=10)
    assert out.columns == ["k", "threshold", "tp", "fp", "fn", "tn"]
    assert out.count() == 0


def test_operating_curve_releases_its_cache(planted, spark):
    """operating_curve materializes both its actions internally, so its
    persist must not outlive the call (r10 advice)."""
    from data_engineering_spark.operators.classify import operating_curve

    before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    w, _ = train_perceptron(planted, F.col("y"), iterations=3, buckets=64)
    scored = classifier_margins(planted, w, buckets=64)
    operating_curve(scored, planted.select("doc_id", "y"), n_bins=10).collect()
    after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert after <= before


def test_operating_curve_rejects_degenerate_bins(planted):
    from data_engineering_spark.operators.classify import operating_curve

    scored = classifier_margins(planted, [], buckets=64)
    with pytest.raises(ValueError, match="n_bins"):
        operating_curve(scored, planted.select("doc_id", "y"), n_bins=1)
