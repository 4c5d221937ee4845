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
# ROUND-9 WINDOW. Round-8 sweep state: 49/50 green; the one red row was
# curate_token_budget (float round() boundary drift between engines —
# fixed this round with an exact-integer quality_micro ranking key, so
# its shape CHANGED and it re-proves first). Latest-green by round:
# r8=49, r6=47, r5=45, r4=47, never=4. Window priority, by the standing
# rule (never-proven outranks re-proofs, changed shapes count as
# unproven):
#   1. Changed shapes + never-proven leads: curate_token_budget
#      (integer fixed-point re-rank, the r8 red row),
#      dedup_threshold_sweep (re-based from the quadratic exact-pair
#      join onto the blocked candidate stream with integer banding),
#      search_suggest / sim_knn_classify (r8 additions never swept),
#      and the four round-9 additions nlp_bpe_merges_batched /
#      nlp_bpe_apply / nlp_bpe_fertility / dedup_cluster_histogram
#      (batched BPE trainer + learn->apply->measure chain; dedup
#      operating report).
#   2. The round-9 float-audit SHAPE CHANGES (quality family re-keyed
#      on exact integer micros — text_quality, corpus_prepare,
#      dedup_keep_best, curate_quality_repetition, corpus_pipeline_e2e;
#      each re-proven locally at both SFs post-change).
#   3. 35 rows of the 47-query r4-green frontier, in their registration
#      order — last driver-proven in round 4, displaced from the r8
#      window by the round-7/8 addition backlog
#      (curate_quality_repetition rides in tier 2 instead).
# ROUND-10 ROTATION NOTE: lead with any round-10 additions/changes,
# then the 11 frontier rows that did not fit this round
# (curate_decontaminate, curate_mixture_weights, curate_pack_concat,
# curate_chunk_sliding, curate_unigram_nll, nlp_embed_text,
# nlp_tokenize_pandas, st_interval_join, lake_time_travel,
# lake_delete_scan, lake_zorder_scan), then the r5
# cohort (45 rows, see ROADMAP); the r6/r8/r9 greens rotate after.
# Exactly 50; rows-only queries sink behind the window so no sweep slot
# records a weak no_oracle row.
registry.finalize_order(
    [
        "curate_token_budget",
        "dedup_threshold_sweep",
        "search_suggest",
        "sim_knn_classify",
        "nlp_bpe_merges_batched",
        "nlp_bpe_apply",
        "nlp_bpe_fertility",
        "dedup_cluster_histogram",
        "dedup_verbatim_spans",
        "curate_mixture_waterfill",
        # float-audit shape changes (quality family re-keyed on exact
        # integer micros; re-proven locally at both SFs post-change)
        "text_quality",
        "corpus_prepare",
        "dedup_keep_best",
        "curate_quality_repetition",
        "corpus_pipeline_e2e",
        # r4 frontier, registration order (35 of 47)
        "j6_asof_join",
        "a5_last_wins_merge",
        "w2_moving_avg",
        "w3_lag_delta",
        "f10_timestamp_rebuild",
        "f17_json_extract",
        "s2_dialect_sql_etl",
        "tpch_q18_large_orders",
        "tpch_q19_disjunctive_revenue",
        "tpch_q15_top_supplier",
        "tpch_q20_part_suppliers",
        "a15_percentiles",
        "j7_cross_join",
        "a16_nested_doc_assembly",
        "a14_grouping_sets",
        "explode_top_tokens",
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q12_late_shipments",
        "tpch_q13_order_distribution",
        "tpch_q17_small_quantity_revenue",
        "tpch_q21_waiting_suppliers",
        "tpch_q22_global_sales_opportunity",
        "m1_merge_upsert",
        "m2_cdc_apply",
        "m3_scd2_dimension",
        "prof_orders_profile",
        "dq_expectations",
        "skew_top_keys",
        "j8_range_join",
        "j9_salted_join",
        "j10_fuzzy_join",
        "mv_incremental_refresh",
        "curate_pii_redact",
        "curate_sample_stratified",
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
