"""SparkSession factory tuned for the engine.

The reference creates its session through Glue (``SparkContext →
GlueContext → spark_session``, reference ``Talent_Opportunity_Platform/
AWS_GLUE_ETL.py:61-63``) and sizes parallelism per job via Glue worker
counts (``Airflow_week.py:135,347,356-359``). Here the equivalent knobs are
Spark confs, chosen for the 100 TB design point:

- **AQE on** (coalesce post-shuffle partitions, runtime broadcast
  conversion, skew-join splitting) so plans re-optimize with real stats —
  this replaces the reference's hand-picked 2/10/20-worker sizing.
- ``spark.sql.shuffle.partitions`` defaults to a multiple of local cores;
  on a real cluster AQE coalescing makes the initial number a ceiling, not
  a target.
- Session timezone pinned to **UTC** so date/timestamp rendering matches
  the DuckDB oracle byte-for-byte (the reference instead hard-codes UTC+9
  arithmetic everywhere, e.g. ``AWS_GLUE_ETL.py:119``; we expose that as an
  explicit INTERVAL op, see ``functions/scalar.py``).
- Arrow enabled: every pandas_udf / applyInPandas boundary is
  Arrow-vectorized, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "prepare_session"]


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    except ValueError:
        return os.cpu_count() or 4


def get_spark(app_name: str = "data-engineering-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a local session with scale-appropriate defaults."""
    n = cpus or _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # iterative ops (pagerank_integer, prefix_sum, canonical
        # assignment) write one cluster checkpoint per round under
        # reliable_checkpoints=True; without this cleaner flag Spark
        # never removes superseded rounds and a long run accumulates one
        # full score-table copy per iteration in the checkpoint dir
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    spark = builder.getOrCreate()
    prepare_session(spark)
    return spark


def prepare_session(spark: SparkSession) -> SparkSession:
    """Set runtime-mutable confs we depend on, on an externally-built session.

    The correctness driver hands us its own SparkSession; only runtime-
    settable confs can be fixed up here (timezone matters for oracle
    parity, AQE for plan quality).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Partition values stay strings (the reference's bkup_dt yyyyMMdd keys
    # are strings, BkupRs.py:234-239; inference would coerce them to int).
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # Runtime bloom-filter injection is gated on a ≥10 GB application-side
    # SCAN, but plans rooted in cached relations (the incremental-dedup
    # replays) bypass that estimate, so Spark injects default-sized blooms
    # (~1 MB buffer per aggregation task) at ANY data size — ~10 such
    # builds OOM'd a vanilla 1 GB driver heap alongside the replay's
    # caches (r10 driver-sim finding). r14 measured the throughput side
    # of the same misfire: the 4-batch replay plans carry ~80 injected
    # bloom_filter_agg scalar subqueries (plans/r14/
    # st_streaming_dedup_after.txt), each an extra aggregation pass over
    # a batch-sized cached relation, costing ~15% of the replay
    # (19.4 s → 16.5 s with injection off; same on the capped embed
    # replay). Injection is therefore OFF by default here — every place
    # a selective pre-filter pays at scale, this repo builds it
    # explicitly (semi-joins / broadcast key filters, guide §3.2) — and
    # env-togglable for a cluster profile whose scans have real size
    # estimates: SPARK_GRAFT_RUNTIME_BLOOM=1 re-enables, with the sizing
    # caps below still bounding a misfired build to ~100 KB.
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "true" if os.environ.get("SPARK_GRAFT_RUNTIME_BLOOM") == "1" else "false",
    )
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.expectedNumItems", "100000")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "4194304")
    return spark
