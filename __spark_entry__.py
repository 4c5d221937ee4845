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
# ROUND-11 WINDOW. Round-10 sweep state: 50/50 green (the first
# curate_token_budget green closed the last never-proven row; all 204
# oracled queries now have a green stamp). Latest-green by round after
# r10: r10=50, r9=43, r8=46, r6=47, r5=18, never=2 (this round's two
# additions). Window priority, by the standing rule (never-proven
# outranks re-proofs, changed shapes count as unproven):
#   1. Round-11 additions + changed shapes: st_streaming_embed_dedup_capped
#      (the CAPPED production config max_bucket=256 with the bucket-size
#      HAVING gate in the twin — closes r10's one weak item) and
#      nlp_bpe_apply_16x64 (the 1024-merge learned vocab applied via one
#      constant-depth fold projection), both new; then the five
#      changed-shape re-proofs from the r10-advice hardening:
#      nlp_classifier_curve (operating_curve now materializes internally,
#      unpersists, and short-circuits empty input), and the four lattice
#      pair consumers whose verify sides now pre-filter nn > 0 ahead of
#      the null-safe Arrow dot (sim_cosine_near_pairs, dedup_embedding,
#      corpus_semantic_dedup, st_streaming_embed_dedup); then the six
#      whole-file-curation-review changed shapes (the review landed
#      mid-round): curate_unigram_nll (nll re-keyed to per-term-
#      quantized exact integer micros — the old round(avg(double),6)
#      was order-nondeterministic, the forbidden class hiding in an
#      r5-green row), curate_pii_redact (interleaved count-then-replace
#      so overlapped spans count once, oracle mirrored),
#      curate_sample_stratified (contract re-expressed via
#      default_rate=20 to match the oracle's ELSE branch),
#      curate_dsir_select (target total P via 1-row broadcast agg —
#      survives disjoint/empty targets), curate_mixture_weights
#      (localCheckpoint pin, one corpus scan), and
#      curate_split_dedup_aware (canonical fingerprint helper).
#      A second whole-file review (text/dedup engines) landed 10 more
#      changed shapes, all locally re-proven at both SFs under the
#      driver-faithful gate before windowing: the quality family
#      (quality_micro now strips the [''] split artifact and scores
#      blank docs 0 — text_quality, dedup_keep_best,
#      dedup_cluster_histogram, corpus_prepare, curate_token_budget),
#      the persisted signature relations (dedup_ngram_jaccard_portable,
#      dedup_threshold_sweep, dedup_verbatim_spans), the simhash
#      dead-vote trim (dedup_simhash_portable), and the
#      tokenizer-normalized phrase slots (search_match_phrase).
#   2. The full 18-row r5 cohort (oldest stamps in the ledger) — after
#      this sweep the oldest green stamp is r6.
#      A third review (joins/timeseries/profiling/graph) landed 4 more
#      oracled changed shapes: j6_asof_join (SQL NULL semantics — a
#      NULL-ts right row's payload no longer leaks into every left row
#      — plus deterministic tie-break on the payload struct),
#      j9_salted_join / j10_fuzzy_join (same-name and shared-lineage
#      key references resolve instead of AMBIGUOUS_REFERENCE), and
#      prof_column_entropy (enforced 1e10-row int64-exactness gate).
#   3. The first 4 of the 47-row r6 cohort, in registration order (the
#      21 review re-proofs (incl. dq_expectations, whose oracle now
#      mirrors the NULL-FK semantics, and the j6 oracle re-keyed to a
#      deterministic LATERAL argmax) displaced p6-p12, j2-j5, a1-a11, o1 to
#      round 12 — correctness stamps on changed code outrank
#      staleness).
# ROUND-12 ROTATION NOTE: lead with any round-12 additions/changes,
# then the 43 r6-cohort leftovers (p6-p10, p12_concat_projection, j2-j5,
# a1_listagg_distinct, a2_collect_list_sorted, a3_distinct_projection,
# a4_count_audit, a6_vector_assembly, a7_distinct_sorted_dates,
# a8_group_minmax, a9_rollup, a10_cube, a11_distinct_count,
# o1_limit_probe, u1_union_all, u3_intersect, u4_except,
# f8_case_like_normalizer, tpch_q4/q6/q14, prof_heavy_hitters,
# mm_pixel_features, mm_resize_images, mm_image_dedup,
# nl_query_range/distinct/cardinality/scalar, funnel_conversion,
# text_winnow_fingerprints, dedup_simhash_portable (re-rotates
# normally), dedup_shared_passages, search_query_string,
# search_inverted_index), which retires most of the r6 tail (the rest
# in r13); then the r8 cohort in registration order. Exactly 50;
# rows-only queries sink behind the window so no sweep slot records a
# weak no_oracle row.
registry.finalize_order(
    [
        # tier 1 — round-11 additions (never-proven) + changed shapes
        "st_streaming_embed_dedup_capped",
        "nlp_bpe_apply_16x64",
        "nlp_classifier_curve",
        "sim_cosine_near_pairs",
        "dedup_embedding",
        "corpus_semantic_dedup",
        "st_streaming_embed_dedup",
        "curate_unigram_nll",
        "curate_pii_redact",
        "curate_sample_stratified",
        "curate_dsir_select",
        "curate_mixture_weights",
        "curate_split_dedup_aware",
        "text_quality",
        "dedup_keep_best",
        "dedup_cluster_histogram",
        "corpus_prepare",
        "curate_token_budget",
        "dedup_ngram_jaccard_portable",
        "dedup_threshold_sweep",
        "dedup_verbatim_spans",
        "dedup_simhash_portable",
        "search_match_phrase",
        "j6_asof_join",
        "dq_expectations",
        "j9_salted_join",
        "j10_fuzzy_join",
        "prof_column_entropy",
        # tier 2 — the 18-row r5 cohort (oldest stamps), registration order
        "ts_gap_fill",
        "events_transition_matrix",
        "text_stats",
        "text_token_count",
        "text_fingerprint",
        "text_lang_id",
        "dedup_exact",
        "dedup_ngram_exact",
        "dedup_cluster_components",
        "search_tfidf_rank",
        "search_bm25_rank",
        "search_hybrid_rrf",
        "sim_cosine_topk",
        "sim_cosine_topk_fast",
        "tpch_q2_min_cost_supplier",
        "tpch_q9_product_type_profit",
        "tpch_q11_important_stock",
        "tpch_q16_parts_supplier_relationship",
        # tier 3 — first 4 of the r6 cohort, registration order
        "p1_projection_alias",
        "p2_literal_plus_star",
        "p4_computed_interval_column",
        "p5_rename_drop",
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
