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
# Round-6 window, executing the r5 verdict's rotation order. State after
# round 5's 50/50-green sweep (latest-green per query computed from
# CORRECTNESS_r01..r05):
#   - 14 never-proven oracle rows from this round lead: the four
#     nl2sql intents, the portable simhash/minhash twins, the ES
#     query_string ranker, the oracle-chained minhash canonicalization,
#     the two-pass Misra-Gries heavy hitters,
#     the new pixel-features query, and the four
#     rows-only→oracle conversions (image dedup, image resize, winnow
#     fingerprints, shared passages) — never-proven outranks re-proofs.
#   - search_inverted_index (block-segmented postings, the r5 scale
#     defect fix) and funnel_conversion (single-window rewrite) changed
#     materially this round; their r5 greens are evidence about the old
#     code, so they re-prove with the new shapes.
#   - The 31 queries whose latest green is r3 (the r5 verdict's item 1
#     list, verbatim) refresh next — no oracle-backed query's latest
#     green may age past two rounds.
#   - The remaining 3 slots take the oldest r4-era greens in
#     registration order.
# The 15 rows-only queries sink behind the window so no sweep slot
# records a weak no_oracle row.
#
# ROUND-7 ROTATION NOTE: if this window sweeps green, every oracle-backed
# query's latest green is r4+ and the staleness frontier moves to the 47
# r4-green queries NOT refreshed this round (p4/p9/p10 got slots here;
# the frontier is the rest of the r4 list: w2/w3, f10/f17, deep TPC-H
# q7/q8/q12/q13/q15/q17-q22, the m1-m3 merge pack, prof/dq/skew/mv,
# j7-j10, the curation pack, nlp_embed/tokenize, st_interval_join, the
# lake trio, a14-a16, explode_top_tokens) — lead round 7 with those,
# oldest-first, then rotate the r5 greens.
registry.finalize_order(
    [
        # -- never swept: registered this round -------------------------
        "nl_query_range",
        "nl_query_distinct",
        "nl_query_scalar",
        "nl_query_cardinality",
        "prof_heavy_hitters",
        "dedup_simhash_portable",
        "dedup_minhash_portable",
        "dedup_minhash_canonical_portable",
        "search_query_string",
        "mm_pixel_features",
        "text_winnow_fingerprints",
        "dedup_shared_passages",
        "mm_image_dedup",
        "mm_resize_images",
        # -- implementations changed this round (re-prove new shapes) ---
        "search_inverted_index",
        "funnel_conversion",
        # -- latest green is r3: the verdict's 31-name refresh list -----
        "u1_union_all",
        "o3_topk",
        "p12_concat_projection",
        "j2_inner_join_filter",
        "j3_semi_join",
        "j4_broadcast_lookup_join",
        "j5_anti_join",
        "a1_listagg_distinct",
        "a2_collect_list_sorted",
        "a6_vector_assembly",
        "a9_rollup",
        "a13_grouped_pivot",
        "tpch_q4_order_priority",
        "tpch_q6_forecast_revenue",
        "tpch_q14_promo_revenue",
        "p1_projection_alias",
        "p2_literal_plus_star",
        "p5_rename_drop",
        "p6_like_filter",
        "p7_date_string_filter",
        "p8_retention_cutoff_filter",
        "a3_distinct_projection",
        "a4_count_audit",
        "a7_distinct_sorted_dates",
        "a8_group_minmax",
        "a10_cube",
        "a11_distinct_count",
        "o1_limit_probe",
        "u3_intersect",
        "u4_except",
        "f8_case_like_normalizer",
        # -- oldest r4-era greens, registration order -------------------
        "p4_computed_interval_column",
        "p9_boolean_compound_filter",
        "p10_value_scrub",
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
