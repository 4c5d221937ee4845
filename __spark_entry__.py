"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``data_engineering_spark/`` — queries register in
``data_engineering_spark.registry`` via the decorator in
``queries_relational.py`` / ``queries_llm.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_spark import registry  # noqa: E402

# Import order IS registration order IS the driver's sweep order. The
# relational pack goes first: those queries are sub-second each, while the
# NLP/dedup/similarity pack carries the expensive Python-UDF work — if the
# sweep runs under a wall-clock budget, the cheap majority must not queue
# behind the slow tail (round 1's sweep truncated after 50 entries and
# left every aggregation/window/TPC-H query without a hard signal).
from data_engineering_spark import queries_relational  # noqa: E402,F401  (side-effect: register)
from data_engineering_spark import queries_curation  # noqa: E402,F401
from data_engineering_spark import queries_extra  # noqa: E402,F401
from data_engineering_spark import queries_llm  # noqa: E402,F401
from data_engineering_spark import queries_tpch_ps  # noqa: E402,F401
from data_engineering_spark.session import prepare_session  # noqa: E402

# The driver sweeps the FIRST 50 registered names per round, so order is a
# verification-scheduling decision. The window is exactly 50 slots and has
# TWO machine-distinguishable parts (r12 verdict #2 — two hand-count
# ledger slips in two rounds ended the hand-maintained queue):
#
#   WINDOW_LEAD — hand-curated: this round's changed shapes (re-proof
#   outranks staleness), never-driver-proven additions, and deliberate
#   rows-only waiver slots. Every entry carries its justification below.
#
#   WINDOW_STALE — pure policy, NOT judgment: the remaining slots hold
#   exactly the oldest-stamped oracled queries, ordered by (latest green
#   stamp across CORRECTNESS_r*.json, original registration order),
#   excluding WINDOW_LEAD. tests/test_rotation_ledger.py RECOMPUTES this
#   list from the raw artifacts and fails if the committed list drifts —
#   the o3_topk drop class (r12: the 13th r6 row fell out of the
#   hand-enumerated r13 queue) can no longer happen silently.
#
# ROUND-13 WINDOW. Round-12 sweep state: 49 green + 1 clean rows-only
# waiver (50/50 as planned); every one of the 209 oracled queries has a
# green stamp across CORRECTNESS_r01-r12; oldest live stamp r6 (13 rows),
# then r8 (41 rows). This window retires the whole r6 cohort — including
# o3_topk, restored per r12 verdict #1 — and 25 of the 41 r8 rows (the
# three sketch-pack LEAD additions displaced three); the remaining 16
# r8 rows lead ROUND-14's stale tail (the reconciliation test
# recomputes them; no hand list to drop rows from — and these COUNTS
# are prose, the r13 end-of-round review caught the first draft
# hand-miscounting them: the LIST is the ledger, numbers commentary).
WINDOW_LEAD = [
    # --- r13 changed shapes (r12 advice pack), locally re-proven at
    # sf0.01 before windowing:
    # nlp_split_sentences: per-call temp-view names became a bounded
    # 16-slot ring (catalog growth capped for foreachBatch callers;
    # eager spark.sql analysis makes slot reuse rebind-safe).
    "nlp_split_sentences",
    # lake_cdf_scan / lake_incremental_mv: version_changes() now handles
    # schema-evolving version ranges (missing-side value columns project
    # as typed NULLs; absent keys raise) — both consumers re-prove.
    # (The r13 txlog re-pass also made _rewrite_where re-stage each
    # partition-layout group separately and _stage drop zero-row part
    # files — row-result-identical for every registered query; the whole
    # lake/merge family was locally re-proven at sf0.01 AND sf0.1 with
    # no extra slots spent, the nlp_tfidf_keywords r12 precedent. Same
    # treatment for the r13 similarity re-pass's lsh_buckets_pandas
    # null-safety hardening: byte-identical signatures for valid rows —
    # pytest-pinned — and st_streaming_embed_dedup/_capped plus the
    # windowed bucketed pair re-proven at both SFs.)
    "lake_cdf_scan",
    "lake_incremental_mv",
    # --- r12 late-round changed shapes queued by the r12 rotation note:
    # mm_sample_frames: explode_outer — NULL-duration videos survive as a
    # classified NULL-frame row instead of vanishing (three-valued-logic
    # vanish class). mm_audio_features: decode_wav raises on fmt/data
    # chunks whose declared size overruns the payload instead of silently
    # decoding truncated audio. Both re-proven at both SFs in r12.
    "mm_sample_frames",
    "mm_audio_features",
    # --- never driver-proven (new in r13): the hash-exact oracle of the
    # FULL bucketed embedding-dedup pipeline — banded LSH signatures,
    # max_bucket purge, candidate join, lattice verify, canonical tail
    # all re-derived in DuckDB (r12 verdict #3's preferred resolution
    # for the 100 TB dedup scale path's missing correctness record).
    "dedup_embedding_bucketed_portable",
    # --- never driver-proven (new in r13): merge-on-read DELETE via
    # deletion vectors — sparse row positions committed to the log, zero
    # file rewrites, DV-aware scan through a broadcast anti-join on
    # (basename, parquet row_index); oracle = complementary WHERE on the
    # raw table (proven at sf0.001/0.01/0.1 pre-window).
    "lake_dv_delete_scan",
    # --- never driver-proven (new in r13): the mergeable-sketch rollup
    # pack (operators/sketches.py — native DataSketches HLL sketch-table
    # build/merge with bound-checked estimates, count-min frequency
    # bounds, and integer histogram sketches whose quantile reads are
    # hash-exact). Never-proven outranks staleness, so these take the
    # three tail slots of the stale cohort (the displaced rows are r8
    # stamps that lead the r14 policy tail automatically).
    "sketch_distinct_rollup",
    "sketch_freq_cms",
    "sketch_histogram_quantiles",
    # --- rows-only waiver slots (r12 verdict #3: the never-swept six,
    # highest-value first): the production bucketed dedup config itself
    # (threshold 0.9 — vacuous under an oracle on isotropic driver data,
    # now anchored by the portable twin above) and the zero-shuffle
    # Arrow SimHash kernel. Each records a clean no_oracle row with
    # schema + row count. The remaining four (sim_pq_topk,
    # curate_pack_ffd, ts_downsample_lttb, a17_percentiles_approx — all
    # with oracled portable twins already green) queue for r14+.
    "dedup_embedding_bucketed",
    "dedup_simhash_arrow",
]

# Computed by the staleness policy; verified against CORRECTNESS_r*.json
# by tests/test_rotation_ledger.py (do NOT hand-edit without re-running
# it — the test IS the ledger).
WINDOW_STALE = [
    "o3_topk",  # r6
    "tpch_q4_order_priority",  # r6
    "tpch_q6_forecast_revenue",  # r6
    "tpch_q14_promo_revenue",  # r6
    "mm_pixel_features",  # r6
    "mm_resize_images",  # r6
    "nl_query_range",  # r6
    "nl_query_distinct",  # r6
    "nl_query_cardinality",  # r6
    "nl_query_scalar",  # r6
    "text_winnow_fingerprints",  # r6
    "search_query_string",  # r6
    "search_inverted_index",  # r6
    "a13_grouped_pivot",  # r8
    "a18_unpivot_long",  # r8
    "w5_time_weighted_avg",  # r8
    "prof_value_correlation",  # r8
    "prof_drift_psi",  # r8
    "curate_pack_ffd_portable",  # r8
    "curate_mixture_temperature",  # r8
    "curate_boilerplate_strip",  # r8
    "curate_shard_shuffle",  # r8
    "curate_word_dropout",  # r8
    "curate_domain_cap",  # r8
    "nlp_subword_tokenize",  # r8
    "nlp_subword_doc_tokens",  # r8
    "nl_query_having",  # r8
    "nl_query_trend",  # r8
    "nl_query_join",  # r8
    "ts_anomaly_zscore",  # r8
    "ts_downsample_lttb_portable",  # r8
    "events_sessionize",  # r8
    "ts_ses_smooth",  # r8
    "ts_mad_outliers",  # r8
    "lake_snapshot_diff",  # r8
    "graph_pagerank_events",  # r8
    "nlp_bpe_merges",  # r8
    "events_path_mining",  # r8
]

registry.finalize_order(
    WINDOW_LEAD + WINDOW_STALE,
    rows_only_waivers=frozenset({"dedup_embedding_bucketed", "dedup_simhash_arrow"}),
)



def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §3.3 serving-index pipeline) on sf0.001."""
    prepare_session(spark)
    return registry.QUERIES["flagship_serving_index"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def bind(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            prepare_session(spark)
            return fn(spark, sf_dir)

        return wrapped

    return {name: bind(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLE)
