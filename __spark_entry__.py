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
# ROUND-10 WINDOW. Round-9 sweep state: 49/50 green; the one red row was
# curate_token_budget — root-caused this round to an ORACLE dtype defect
# (DuckDB window SUM returns HUGEINT, pandas materializes it float64, the
# driver hashed "14997.0" vs Spark's "14997"); the oracle now CASTs back
# to BIGINT, so the row re-proves first. Latest-green by round: r9=50,
# r8=45, r6=47, r5=43, r4=11, never=1. Window priority, by the standing
# rule (never-proven outranks re-proofs, changed shapes count as
# unproven):
#   1. Round-10 additions + changed shapes: nlp_bpe_vocab_16x64 (the
#      real-vocab BPE trainer, new), curate_token_budget (oracle cast
#      fix — the never-green row), the six micro_ratio consumers
#      (the helper now floor-divides via Spark's integral `div` instead
#      of the exact-below-2^53 double trick — same values on every
#      current corpus, but the expression changed, so the quality
#      family re-proves: text_quality, corpus_prepare, dedup_keep_best,
#      dedup_cluster_histogram, curate_quality_repetition,
#      corpus_pipeline_e2e), and the four exact-lattice admission
#      conversions (FLOATS.md round-then-filter class closed:
#      membership now integer arithmetic on the 1e-6 direction
#      lattice — sim_cosine_near_pairs, dedup_embedding,
#      corpus_semantic_dedup, st_streaming_embed_dedup).
#   2. The 11 r4-frontier rows that did not fit round 9's window
#      (last driver-proven in round 4).
#   3. 22 rows of the 43-query r5 cohort, in registration order.
#   (Round-10 late additions displaced two more tail rows: the
#   perceptron trainer/scorer pair — never-proven leads by the
#   standing rule; text_token_count / text_fingerprint /
#   events_transition_matrix / text_stats join the round-11
#   leftovers — the classifier pack is 4 queries: trainer, scorer,
#   operating curve, per-lang bias audit — plus span-level
#   decontamination, curate_decontaminate_spans.)
# ROUND-11 ROTATION NOTE: lead with any round-11 additions/changes,
# then the 13 r5-cohort rows that did not fit this round
# (dedup_exact, dedup_ngram_exact, dedup_cluster_components,
# text_token_count, text_fingerprint, events_transition_matrix,
# text_stats, ts_gap_fill,
# search_tfidf_rank, search_bm25_rank, search_hybrid_rrf,
# sim_cosine_topk, sim_cosine_topk_fast, tpch_q2_min_cost_supplier,
# tpch_q9_product_type_profit, tpch_q11_important_stock,
# tpch_q16_parts_supplier_relationship, text_lang_id — note
# corpus_semantic_dedup / sim_cosine_near_pairs / dedup_embedding
# graduated into this round's tier 1 as changed shapes), then the r6
# cohort (47 rows); the r8/r9/r10 greens rotate after. Exactly 50;
# rows-only queries sink behind the window so no sweep slot records a
# weak no_oracle row.
registry.finalize_order(
    [
        # tier 1 — round-10 additions + changed shapes
        "nlp_train_quality_classifier",
        "nlp_classifier_score",
        "nlp_classifier_curve",
        "nlp_classifier_bias_audit",
        "curate_decontaminate_spans",
        "nlp_bpe_vocab_16x64",
        "curate_token_budget",
        "text_quality",
        "corpus_prepare",
        "dedup_keep_best",
        "dedup_cluster_histogram",
        "curate_quality_repetition",
        "corpus_pipeline_e2e",
        "sim_cosine_near_pairs",
        "dedup_embedding",
        "corpus_semantic_dedup",
        "st_streaming_embed_dedup",
        # tier 2 — the 11 r4-frontier rows
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
        # tier 3 — r5 cohort, registration order (22 of 43)
        "flagship_serving_index",
        "p11_fulltext_search",
        "w1_rank_in_group",
        "w4_distribution_ranks",
        "f_scalar_pack",
        "tpch_q1_pricing_summary",
        "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier",
        "tpch_q10_returned_items",
        "curate_split_train_val",
        "curate_sample_weighted",
        "nlp_tfidf_keywords",
        "nlp_keyword_extract",
        "nlp_split_sentences",
        "st_tumbling_counts",
        "st_sliding_value_sum",
        "st_session_windows",
        "mm_media_metadata",
        "mm_sample_frames",
        "mm_audio_features",
        "nl_query_template",
        "cohort_retention",
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
