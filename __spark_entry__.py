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
# oracle-backed — finalize_order raises on rows-only entries here):
#
# ROUND-5 ROTATION NOTE: after this round's sweep, the only oracle-backed
# queries with NO driver signal in any round are the six added mid-round-4
# (tpch_q2_min_cost_supplier, tpch_q9_product_type_profit,
# tpch_q11_important_stock, tpch_q16_parts_supplier_relationship,
# nl_query_template, dedup_ngram_exact) — put them first in the next
# priority list, then refresh the r1-only greens (text_*/dedup_exact/
# sim_*/search_*/nlp_*/mm_* pack, last swept round 1).
#   1. the 10 events-table queries that ERR'd in round 3 (regression fix
#      needs a current-round green), then
#   2. the 38 oracle-backed queries no round has ever swept (merge/lake/
#      curation/profiling packs, deep TPC-H, join extras), then
#   3. the 2 Arrow-NLP queries whose r1 ERR predates their
#      canonicalizer-safe serialization.
# Everything else keeps registration order behind them; all 16 rows-only
# queries sink to the tail so no sweep slot records a weak no_oracle row.
registry.finalize_order(
    [
        # -- round-3 events regressions --------------------------------
        "p4_computed_interval_column",
        "p9_boolean_compound_filter",
        "p10_value_scrub",
        "j6_asof_join",
        "a5_last_wins_merge",
        "w2_moving_avg",
        "w3_lag_delta",
        "f10_timestamp_rebuild",
        "f17_json_extract",
        "s2_dialect_sql_etl",
        # -- never driver-swept: aggregations / joins ------------------
        "a14_grouping_sets",
        "a15_percentiles",
        "a16_nested_doc_assembly",
        "j7_cross_join",
        "j8_range_join",
        "j9_salted_join",
        "j10_fuzzy_join",
        # -- never driver-swept: profiling / quality / skew ------------
        "prof_orders_profile",
        "dq_expectations",
        "skew_top_keys",
        # -- never driver-swept: DML / lakehouse -----------------------
        "m1_merge_upsert",
        "m2_cdc_apply",
        "m3_scd2_dimension",
        "mv_incremental_refresh",
        "lake_time_travel",
        "lake_delete_scan",
        "lake_zorder_scan",
        # -- never driver-swept: curation pack -------------------------
        "curate_pii_redact",
        "curate_quality_repetition",
        "curate_sample_stratified",
        "curate_decontaminate",
        "curate_mixture_weights",
        "curate_pack_concat",
        "curate_chunk_sliding",
        "curate_unigram_nll",
        # -- never driver-swept: streaming twin / text -----------------
        "st_interval_join",
        "explode_top_tokens",
        # -- never driver-swept: deep TPC-H ----------------------------
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q12_late_shipments",
        "tpch_q13_order_distribution",
        "tpch_q15_top_supplier",
        "tpch_q17_small_quantity_revenue",
        "tpch_q18_large_orders",
        "tpch_q19_disjunctive_revenue",
        "tpch_q20_part_suppliers",
        "tpch_q21_waiting_suppliers",
        "tpch_q22_global_sales_opportunity",
        # -- r1 ERRs, since serialized canonicalizer-safe --------------
        "nlp_tokenize_pandas",
        "nlp_embed_text",
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
