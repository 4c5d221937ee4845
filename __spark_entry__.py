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
# verification-scheduling decision. Priority window (exactly 50, oracle-
# backed except one explicit rows-only waiver — see below).
#
# ROUND-12 WINDOW. Round-11 sweep state: 50/50 green (the capped
# streaming-embed-dedup production config and the 1024-merge BPE apply
# both proven; every one of the 206 oracled queries has a green stamp
# across CORRECTNESS_r01-r11; oldest live stamp r6). Window priority,
# by the standing rule (changed shapes count as unproven and outrank
# staleness):
#   1. The 18 round-12 changed shapes, all locally re-proven at sf0.01
#      under the driver-faithful string gate before windowing:
#      - the quality-key consumers (text_quality, dedup_keep_best,
#        dedup_cluster_histogram, corpus_prepare, curate_token_budget):
#        quality_micro's when(n==0) blank-doc guard became the
#        arithmetic den=greatest(400n,1) — the conditional was
#        disqualifying the key from codegen subexpression elimination,
#        the actual cause of the r11 corpus_prepare 1.85x bench
#        regression (same semantics, byte-identical on adversarial
#        inputs — tests/test_text_quality.py);
#      - the persisted-signature dedup relations
#        (dedup_ngram_jaccard_portable, dedup_threshold_sweep,
#        dedup_verbatim_spans, dedup_shared_passages): their per-call
#        session-lifetime persists now route through the bounded
#        lock-guarded memo registry (r11 advice);
#      - j9_salted_join: both sides alias-qualified so shared-lineage
#        self-joins resolve (r11 advice; new pytest);
#      - nlp_bpe_vocab_16x64 / nlp_bpe_apply_16x64: the trained
#        1024-merge table is session-memoized (driver-local rows), so
#        the pair trains ONCE per sweep/bench session (r11 verdict #2);
#      - curate_dsir_select: the target total rides a full-outer join
#        of the two parameter-bounded count tables instead of a
#        separate eager-localCheckpoint branch (one target pass, no
#        plan-build side effect; disjoint/empty-target semantics pinned
#        in tests/test_curation.py);
#      - m1_merge_upsert / m2_cdc_apply / m3_scd2_dimension: the queued
#        r11 warehouse-pack review landed (ROADMAP.md r12 lead item) —
#        merge_upsert's duplicate guard anchored so empty-payload
#        (key-only) merges keep it (#3), apply_cdc raises on NULL/
#        unknown ops instead of silently dropping the row (#4), and
#        scd2_apply rebuilt as ONE full-outer join + array-of-struct
#        explode row generator with a presence flag (never the nullable
#        valid_from sentinel, #2), a duplicate-update-key raise_error
#        guard (#1), and exactly one planned join (#5, plan-asserted in
#        tests/test_merge.py). lake_zorder_scan re-proven too (zvalue
#        approx path: null-parity + numeric gate + 12-bit cap, #6/#7 —
#        its registered query uses the window path, plan unchanged);
#      - a5_last_wins_merge: max_by's order key is struct(order_col,
#        col), so order ties resolve to the max value instead of
#        shuffle merge order (between-runs nondeterminism, the
#        forbidden class — r12 aggregation review);
#      - f10_timestamp_rebuild: concat (NULL-propagating, = SQL ||)
#        replaces concat_ws, whose null-SKIP handed ANSI to_timestamp
#        an unparseable bare date — one NULL part crashed the query
#        (r12 functions review; invisible to the f10 oracle, whose
#        inputs derive non-null). nlp_tfidf_keywords' per-call persist
#        also routed through the bounded memo registry — identical
#        plan, locally re-proven, no window slot spent.
#   2. mm_extract_features — the ONE rows-only waiver
#      (finalize_order(rows_only_waivers=...)): its only driver record
#      is the r1 canonicalizer crash, fixed in r2 by the to_json
#      reshape and pytest-proven via the exact driver canon path, but
#      never re-recorded because the guard kept rows-only names behind
#      the window (r11 verdict #5). One deliberate slot converts the
#      permanent ERR into a clean rows-only row; it returns to the tail
#      in r13.
#   2.5 the three r12 late lake additions (CDF, OPTIMIZE ZORDER,
#      CDF-driven incremental MV), never driver-proven — they displace
#      the three unchanged TPC-H r6 rows (q4/q6/q14) to r13.
#   3. 28 of the 40-row r6 cohort (oldest stamps), in registration
#      order, EXCEPT funnel_conversion is swapped in ahead of the
#      nl_query/mm rows: it predates the FLOATS.md integer-micro
#      discipline and the r11 verdict (#6) asks for its re-proof under
#      the driver-faithful gate this round (mm_image_dedup, the other
#      pre-FLOATS row, makes the cut in registration order). The 9
#      leftovers are enumerated in the ROUND-13 note below — the r12
#      end-of-round review caught this ledger's first draft claiming
#      36-of-42 while the list held 31.
# ROUND-13 ROTATION NOTE: lead with any round-13 additions/changes —
# the r12 leftovers (tpch_q4_order_priority, tpch_q6_forecast_revenue,
# tpch_q14_promo_revenue — displaced by the three late lake additions,
# which took window slots under the never-proven-outranks-staleness
# rule) and two r12 late-round changed shapes
# already queued: mm_sample_frames
# (explode_outer: NULL-duration videos survive as a classified
# NULL-frame row instead of vanishing) and mm_audio_features
# (decode_wav raises on a fmt/data chunk whose declared size overruns
# the payload instead of silently decoding truncated audio), both
# locally re-proven at both SFs — then the r6 leftovers (mm_pixel_features, mm_resize_images,
# nl_query_range, nl_query_distinct, nl_query_cardinality,
# nl_query_scalar, text_winnow_fingerprints, search_query_string,
# search_inverted_index), then the r8 cohort in
# registration order (a13_grouped_pivot, a14/a15 percentile rows,
# lake_snapshot_diff, graph_pagerank_events, events_sessionize,
# curate_domain_cap, ts_mad_outliers, corpus_overlap_kmv,
# search_significant_terms, search_suggest, prof_value_correlation,
# events_path_mining, st_streaming_dedup, st_percolate, ...), which the
# r13 window can hold in full; then r9 in registration order.
registry.finalize_order(
    [
        # tier 1 — round-12 changed shapes (re-proof outranks staleness)
        "text_quality",
        "dedup_keep_best",
        "dedup_cluster_histogram",
        "corpus_prepare",
        "curate_token_budget",
        "dedup_ngram_jaccard_portable",
        "dedup_threshold_sweep",
        "dedup_verbatim_spans",
        "dedup_shared_passages",
        "j9_salted_join",
        "nlp_bpe_vocab_16x64",
        "nlp_bpe_apply_16x64",
        "curate_dsir_select",
        "m1_merge_upsert",
        "m2_cdc_apply",
        "m3_scd2_dimension",
        "a5_last_wins_merge",
        "f10_timestamp_rebuild",
        # tier 2 — the one waived rows-only slot (supersedes the r1 ERR)
        "mm_extract_features",
        # tier 2.5 — r12 late additions, never driver-proven (the
        # standing rule: never-proven outranks stale re-proofs; these
        # displace the three unchanged TPC-H r6 rows to r13)
        "lake_cdf_scan",
        "lake_zorder_optimize",
        "lake_incremental_mv",
        # tier 3 — r6 cohort (oldest stamps), registration order, with
        # funnel_conversion swapped in over nl_query_scalar (float
        # re-check, r11 verdict #6)
        "p6_like_filter",
        "p7_date_string_filter",
        "p8_retention_cutoff_filter",
        "p9_boolean_compound_filter",
        "p10_value_scrub",
        "p12_concat_projection",
        "j2_inner_join_filter",
        "j3_semi_join",
        "j4_broadcast_lookup_join",
        "j5_anti_join",
        "a1_listagg_distinct",
        "a2_collect_list_sorted",
        "a3_distinct_projection",
        "a4_count_audit",
        "a6_vector_assembly",
        "a7_distinct_sorted_dates",
        "a8_group_minmax",
        "a9_rollup",
        "a10_cube",
        "a11_distinct_count",
        "o1_limit_probe",
        "u1_union_all",
        "u3_intersect",
        "u4_except",
        "f8_case_like_normalizer",
        "prof_heavy_hitters",
        "mm_image_dedup",
        "funnel_conversion",
    ],
    rows_only_waivers=frozenset({"mm_extract_features"}),
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
