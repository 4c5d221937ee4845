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
# Round-5 window. After round 4's 50/50-green sweep, the state is:
#   - 11 oracle-backed queries have NO green driver row in any round
#     (6 registered mid-round-4 after that round's window froze, 5 swept
#     only in round 1 before their oracles existed) — they lead.
#   - 13 queries are green only from round 1, but their implementations
#     changed materially in round 4 (shingle_hashes/tokens rewrites,
#     decontaminate broadcast removal) — their r1 rows are evidence about
#     old code; they refresh next.
#   - The rest of the window re-proves round-2-era greens (deep TPC-H,
#     join shapes, streaming batch twins, flagship) oldest-first.
# Simple r2-green projections/filters with unchanged implementations
# (p1/p2/p5–p8, a3/a4/a7/a8/a10/a11, o1, u3/u4, f8) stay behind the
# window in registration order; all 16 rows-only queries sink to the tail
# so no sweep slot records a weak no_oracle row.
#
# ROUND-6 ROTATION NOTE: if this window sweeps green, every oracle-backed
# query has a green row from round 2+ EXCEPT the names displaced this
# round to make room for the twelve never-proven round-5 queries (which
# outrank re-proofs per the r4 verdict's own priority): u1_union_all,
# o3_topk, p12_concat_projection, j2_inner_join_filter, j3_semi_join,
# j4_broadcast_lookup_join, j5_anti_join, a1_listagg_distinct,
# a2_collect_list_sorted, a6_vector_assembly, a9_rollup,
# a13_grouped_pivot, tpch_q4_order_priority, tpch_q6_forecast_revenue,
# tpch_q14_promo_revenue, plus the simple r2 projections listed above —
# lead round 6 with those displaced r2-era names (their implementations
# are unchanged, so staleness is the only debt), then rotate by
# oldest-green-first.
registry.finalize_order(
    [
        # -- no driver signal in any round (registered mid-r4) ---------
        "tpch_q2_min_cost_supplier",
        "tpch_q9_product_type_profit",
        "tpch_q11_important_stock",
        "tpch_q16_parts_supplier_relationship",
        "nl_query_template",
        "dedup_ngram_exact",
        # -- no signal: swept r1 before their oracles existed ----------
        "nlp_keyword_extract",
        "nlp_split_sentences",
        "mm_media_metadata",
        "mm_sample_frames",
        "sim_cosine_topk_fast",
        # -- r1-only greens whose implementations changed in r4 --------
        "text_stats",
        "text_token_count",
        "text_fingerprint",
        "text_lang_id",
        "text_quality",
        "dedup_exact",
        "sim_cosine_topk",
        "sim_cosine_near_pairs",
        "dedup_embedding",
        "search_tfidf_rank",
        "search_bm25_rank",
        "corpus_prepare",
        "nlp_tfidf_keywords",
        # -- headline + r1-only streaming batch twins ------------------
        "flagship_serving_index",
        "st_tumbling_counts",
        "st_sliding_value_sum",
        "st_session_windows",
        # -- r2-era greens: deep TPC-H ---------------------------------
        "tpch_q1_pricing_summary",
        "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier",
        "tpch_q10_returned_items",
        # -- new this round: never-proven oracle queries ---------------
        "dedup_cluster_components",
        "w4_distribution_ranks",
        "w5_time_weighted_avg",
        "mm_audio_features",
        "corpus_semantic_dedup",
        "search_hybrid_rrf",
        "ts_anomaly_zscore",
        "a18_unpivot_long",
        "events_transition_matrix",
        "search_inverted_index",
        "curate_split_train_val",
        "curate_sample_weighted",
        # -- r2-era greens: window / search / scalar -------------------
        "w1_rank_in_group",
        "p11_fulltext_search",
        "f_scalar_pack",
        # -- new round-5 event-analytics queries (oracle-backed) -------
        "cohort_retention",
        "ts_gap_fill",
        "funnel_conversion",
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
