"""Iterative graph algorithms as DataFrame programs.

The repo's other iterative op (``dedup.canonical_assignment``) is a
fixpoint on labels; PageRank is the other canonical shape — a fixed
number of numeric power-iteration rounds. Both follow the same Spark
discipline: persist the edge list once, truncate lineage per round, keep
every per-round step a key-partitioned join/aggregate.

Exactness: scores are 1e-9 fixed-point LONGS and every operation is
integer (floor-divided edge contributions, integer damping percents), so
results are independent of partial-aggregation order and an unrolled SQL
twin reproduces them bit-for-bit — the property float PageRank can never
give an oracle.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = 10**9,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    reliable_checkpoints: bool = False,
) -> DataFrame:
    """PageRank in integer fixed point: ``pr' = (100−d)%·S + d%·Σ
    ⌊pr(u)/deg(u)⌋`` over in-edges, all in int64 — deterministic under
    any execution order. ``iterations`` is a fixed unroll (the oracle
    twin mirrors it CTE-for-CTE); convergence-to-ε stopping would make
    the round count data-dependent and the twin unwritable.

    Scale shape: the edge list persists once (every round joins against
    it — without this, round k re-executes the whole upstream edge
    derivation, the classic iterative lineage blowup); each round is ONE
    src-keyed join of the (node, score) table against the degree-
    annotated edges plus ONE dst-keyed partial agg, and scores truncate
    lineage per round (``canonical_assignment``'s pattern);
    ``reliable_checkpoints=True`` swaps the executor-local
    ``localCheckpoint`` for cluster-dir ``checkpoint()`` so losing an
    executor mid-iteration replays from stable storage instead of
    failing the job. Each round writes a NEW checkpoint and Spark only
    deletes the superseded one when
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (set by
    :func:`~data_engineering_spark.session.get_spark`; set it yourself
    on an externally-built session — it is create-time-only) — without
    it a long run accumulates one full score-table copy per iteration
    in the checkpoint dir. Overflow headroom: the binding constraint is the
    damping multiply BEFORE the div — ``damping_pct · inflow`` must fit
    int64, and ``inflow < indeg · max_score`` where per-node scores can
    exceed S after a few rounds (hub nodes accumulate mass). At S=1e9
    and d=85 that bounds indeg·(max_score/S) to ~1e8 — still beyond any
    real fan-in, but two decades tighter than the naive indeg ≤ 9e9
    read of Σ < indeg·S."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    ewd = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    # node set = src ∪ dst: a pure SINK (in-edges only) must rank — it
    # is often the most-linked node — not silently drop out; seeding
    # from deg alone loses it (r8 review finding). Sink outflow is
    # discarded (the simplified-PageRank dangling convention; the
    # redistribute-dangling-mass variant adds a 1-row broadcast sum).
    nodes = e.select(F.col("src").alias("node")).unionByName(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    nodes = nodes.checkpoint() if reliable_checkpoints else nodes.localCheckpoint()
    base = (100 - damping_pct) * scale // 100
    pr = nodes.withColumn("score", F.lit(scale).cast("long"))
    for _ in range(iterations):
        inflow = (
            ewd.join(pr, ewd["src"] == pr["node"])
            .select("dst", F.expr("score div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        pr = nodes.join(inflow, F.col("node") == F.col("dst"), "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(inflow, 0)) div 100")
            )
            .cast("long")
            .alias("score"),
        )
        pr = pr.checkpoint() if reliable_checkpoints else pr.localCheckpoint()
    # scores are checkpoint-truncated — nothing downstream re-reads the
    # cached edges, so release them instead of pinning two edge copies
    # per invocation for the session lifetime
    ewd.unpersist()
    e.unpersist()
    return pr
