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
# verification-scheduling decision. Priority window (exactly 50, all
# oracle-backed — finalize_order raises on rows-only entries here).
#
# ROUND-8 WINDOW. Round 7 ended with the full 190-query registry locally
# green at BOTH sf0.01 and sf0.1 (tools/check_correctness.py, see
# ROADMAP.md "Round 7 end state"), but NO driver sweep was recorded for
# round 7 (no CORRECTNESS_r07.json exists at round-8 start), so
# latest-green state is still the r6 sweep: r6=50, r5=48, r4=47, and the
# round-7 additions are never driver-proven. Window priority, by the
# standing rule (never-proven outranks re-proofs, changed shapes count
# as unproven):
#   1. The 32 never-driver-proven oracle rows: the 29 round-7 additions
#      plus nl_query_join / sim_lsh_topk / sim_ivf_topk (whose planned
#      r7 proof never recorded).
#   2. The 6 queries whose SHAPES changed in round 7 after their last
#      driver green (each re-proven locally at both SFs post-change):
#      dedup_minhash_portable + dedup_minhash_canonical_portable (seeded
#      md5 permutation family fix), w5_time_weighted_avg /
#      ts_anomaly_zscore / a13_grouped_pivot / a18_unpivot_long
#      (order-stable fixed-point aggregation).
#   3. Remaining slots: the round-8 additions (never-proven; 12 of the
#      14 fit — search_suggest and dedup_threshold_sweep defer to round
#      9 as the two whose shapes re-bin already-proven intermediates).
#      The r4-green frontier is fully displaced this round.
# Exactly 50; rows-only queries sink behind the window so no sweep slot
# records a weak no_oracle row.
#
# ROUND-9 ROTATION NOTE: lead round 9 with (in this order):
#   1. Any round-9 additions plus the three deferred round-8 rows
#      (search_suggest, dedup_threshold_sweep, sim_knn_classify) —
#      never driver-proven.
#   2. The 47-query r4-green frontier, oldest-first in its r7-window
#      order (j6_asof_join, a5_last_wins_merge, w2_moving_avg,
#      w3_lag_delta, f10_timestamp_rebuild, f17_json_extract,
#      s2_dialect_sql_etl, tpch q18/q19/q15/q20, a15_percentiles,
#      j7_cross_join, a16_nested_doc_assembly, a14_grouping_sets,
#      explode_top_tokens, tpch q7/q8/q12/q13/q17/q21/q22, m1-m3,
#      prof_orders_profile, dq_expectations, skew_top_keys, j8-j10,
#      mv_incremental_refresh, the r4 curation pack, nlp_embed/tokenize,
#      st_interval_join, the lake trio, a5/a14-a16 — whatever fits the
#      remaining slots).
#   3. Then the r5 cohort. The r6/r7/r8 greens rotate after.
registry.finalize_order(
    [
        # -- never driver-proven: round-7 additions + the 3 planned-r7 leads --
        "prof_column_entropy",
        "curate_pack_ffd_portable",
        "curate_mixture_temperature",
        "curate_token_budget",
        "curate_boilerplate_strip",
        "curate_dsir_select",
        "curate_shard_shuffle",
        "curate_word_dropout",
        "corpus_pipeline_e2e",
        "nlp_subword_tokenize",
        "nlp_subword_doc_tokens",
        "nl_query_having",
        "nl_query_trend",
        "nl_query_join",
        "ts_downsample_lttb_portable",
        "events_sessionize",
        "ts_ses_smooth",
        "dedup_keep_best",
        "st_streaming_dedup",
        "st_streaming_embed_dedup",
        "dedup_ngram_jaccard_portable",
        "sim_lsh_topk",
        "sim_ivf_topk",
        "sim_pq_topk_portable",
        "search_significant_terms",
        "search_more_like_this",
        "search_percolate",
        "search_highlight",
        "sim_kmeans_refine",
        "sim_contrastive_batches",
        "st_percolate",
        "sim_filtered_knn",
        # -- shapes changed in r7 after last driver green ------------------
        "dedup_minhash_portable",
        "dedup_minhash_canonical_portable",
        "w5_time_weighted_avg",
        "ts_anomaly_zscore",
        "a13_grouped_pivot",
        "a18_unpivot_long",
        # -- round-8 additions, never driver-proven (12 of 14; search_suggest
        # -- and dedup_threshold_sweep defer to round 9: both re-bin already-
        # -- proven intermediates, the weakest claim to a slot) --------------
        "search_match_phrase",
        "curate_domain_cap",
        "ts_mad_outliers",
        "sim_int8_quantize",
        "corpus_overlap_kmv",
        "lake_snapshot_diff",
        "graph_pagerank_events",
        "curate_split_dedup_aware",
        "prof_value_correlation",
        "nlp_bpe_merges",
        "prof_drift_psi",
        "events_path_mining",
    ]
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
