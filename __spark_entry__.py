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
# Round-7 window, executing the r6 verdict's item-1 rotation. State after
# round 6's 50/50-green sweep (latest-green per query computed from
# CORRECTNESS_r01..r06: r6=50, r5=48, r4=47):
#   - 3 never-hash-proven oracle rows lead: the nl2sql join intent
#     (new this round) and the LSH/IVF ANN paths, whose rows-only r1
#     entries predate the hash-exact portable twins they now carry —
#     never-proven outranks re-proofs.
#   - The 47 queries whose latest green is r4 (the r6 verdict's item-1
#     frontier, verbatim) fill the rest, in registration order — no
#     oracle-backed query's latest green may age past two rounds.
# Exactly 50; the r5/r6 cohorts (48+50 greens) are within budget and
# rotate next round. The 13 rows-only queries sink behind the window so
# no sweep slot records a weak no_oracle row.
#
# w5_time_weighted_avg / ts_anomaly_zscore / a13_grouped_pivot /
# a18_unpivot_long changed this round (order-stable fixed-point
# aggregation, closing r6 ADVICE item 3); their r5/r6 greens predate the
# new shapes, so each was re-proven locally at BOTH sf0.01 and sf0.1 via
# tools/check_correctness.py this round, and they lead the ROUND-8 window
# alongside the r5 cohort.
#
# ROUND-8 ROTATION NOTE: if this window sweeps green, lead round 8 with
# (in this order):
#   1. The 29 round-7 additions, never driver-proven (each locally green
#      at BOTH SFs this round): st_streaming_dedup,
#      st_streaming_embed_dedup, sim_pq_topk_portable,
#      dedup_ngram_jaccard_portable, ts_downsample_lttb_portable,
#      curate_pack_ffd_portable, nlp_subword_tokenize,
#      nlp_subword_doc_tokens, dedup_keep_best,
#      curate_mixture_temperature, curate_token_budget,
#      curate_boilerplate_strip, curate_dsir_select,
#      curate_shard_shuffle, search_significant_terms,
#      search_more_like_this, nl_query_trend, search_percolate,
#      search_highlight, sim_kmeans_refine, sim_contrastive_batches,
#      curate_word_dropout, corpus_pipeline_e2e, events_sessionize,
#      ts_ses_smooth, st_percolate, sim_filtered_knn,
#      prof_column_entropy, nl_query_having.
#   2. The queries whose SHAPES changed in round 7 after their last
#      driver green (each re-proven locally at both SFs post-change):
#      dedup_minhash_portable + dedup_minhash_canonical_portable (the
#      two-parameter-lambda seed fix made the md5 permutation family
#      actually plan-independent), w5_time_weighted_avg /
#      ts_anomaly_zscore / a13_grouped_pivot / a18_unpivot_long
#      (order-stable fixed-point aggregation).
#   3. The r5-green cohort oldest-first (w1/w4, the event pack,
#      cohort_retention, the five text_* oracles, f_scalar_pack, tpch
#      q1-q3/q5/q9-q11/q16, flagship pair, search tfidf/bm25/rrf, the
#      dedup/sim oracle baselines, corpus pack, mm metadata/frames/
#      audio, nlp keywords ×2, nl_query_template,
#      st tumbling/sliding/session) to fill the remaining ~15 slots
#      (items 1+2 now take ~35 of the 50).
# The rest of the r5 cohort and the r6/r7 cohorts rotate in round 9.
registry.finalize_order(
    [
        # -- never hash-proven oracle rows ------------------------------
        "nl_query_join",
        "sim_lsh_topk",
        "sim_ivf_topk",
        # -- latest green is r4: the verdict's 47-name frontier ---------
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
        "curate_quality_repetition",
        "curate_sample_stratified",
        "curate_decontaminate",
        "curate_mixture_weights",
        "curate_pack_concat",
        "curate_chunk_sliding",
        "curate_unigram_nll",
        "nlp_embed_text",
        "nlp_tokenize_pandas",
        "st_interval_join",
        "lake_time_travel",
        "lake_delete_scan",
        "lake_zorder_scan",
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
