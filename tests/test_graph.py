"""Integer fixed-point PageRank (operators/graph.py): structure
ordering, symmetry, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_spark.operators.graph import pagerank_integer


def _edges(spark, pairs):
    both = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, "src string, dst string")


def test_pagerank_hub_outranks_leaves(spark):
    """Undirected star: the hub must score highest, leaves all equal."""
    e = _edges(spark, [("hub", f"leaf{i}") for i in range(5)])
    pr = {r.node: r.score for r in pagerank_integer(e, iterations=3).collect()}
    leaf_scores = {v for k, v in pr.items() if k.startswith("leaf")}
    assert len(leaf_scores) == 1  # symmetry: identical leaves, identical score
    assert pr["hub"] > max(leaf_scores)


def test_pagerank_symmetric_cycle_is_uniform(spark):
    """On a regular graph (cycle) every node keeps the uniform score."""
    n = 6
    e = _edges(spark, [(f"n{i}", f"n{(i + 1) % n}") for i in range(n)])
    scores = {r.score for r in pagerank_integer(e, iterations=3).collect()}
    assert len(scores) == 1


def test_pagerank_deterministic_across_runs_and_partitionings(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")])
    r1 = sorted(map(tuple, pagerank_integer(e, iterations=3).collect()))
    r2 = sorted(
        map(tuple, pagerank_integer(e.repartition(7), iterations=3).collect())
    )
    assert r1 == r2


def test_pagerank_dangling_source_keeps_base_score(spark):
    """A node nobody links to must coalesce to the base (100−d)%·S, not
    drop out — the left-join arm of the general operator."""
    e = spark.createDataFrame(
        [("loner", "popular"), ("popular", "other"), ("other", "popular")],
        "src string, dst string",
    )
    pr = {r.node: r.score for r in pagerank_integer(e, iterations=2).collect()}
    assert pr["loner"] == 150_000_000  # 15% of 1e9: inflow-free base
    assert pr["popular"] > pr["loner"]


def test_pagerank_sink_node_ranks_highest(spark):
    """A pure sink (in-edges only) must appear in the result and, as the
    most-linked node, outrank its sources — seeding scores from the
    out-degree table alone silently dropped it (r8 review finding)."""
    e = spark.createDataFrame(
        [("a", "sink"), ("b", "sink"), ("a", "b"), ("b", "a")],
        "src string, dst string",
    )
    pr = {r.node: r.score for r in pagerank_integer(e, iterations=3).collect()}
    assert "sink" in pr
    assert pr["sink"] > pr["a"] and pr["sink"] > pr["b"]


def test_pagerank_reliable_checkpoint_identical(spark, tmp_path):
    """reliable_checkpoints=True routes per-round score truncation
    through cluster checkpoint() storage (the executor-loss-tolerant
    mode for real clusters) with bit-identical scores — integer fixed
    point means the two modes cannot even drift by an ulp."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")])
    local = sorted(map(tuple, pagerank_integer(e, iterations=3).collect()))
    reliable = sorted(
        map(
            tuple,
            pagerank_integer(e, iterations=3, reliable_checkpoints=True).collect(),
        )
    )
    assert local == reliable
