"""Smoke: every registered query runs at sf0.001 and yields a stable,
non-degenerate schema. The driver's DuckDB oracle covers value
correctness at sf0.01; these tests gate basic executability fast."""

from __future__ import annotations

import pytest

import __spark_entry__  # noqa: F401  (registers ALL query modules + sweep order)
from data_engineering_spark.registry import ORACLE, QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    assert len(df.columns) == len(set(df.columns)), f"{name}: duplicate column names"
    n = df.count()
    assert n >= 0


def test_every_oracle_has_query():
    missing = set(ORACLE) - set(QUERIES)
    assert not missing, f"oracle without query: {missing}"


def test_flagship_nonempty(spark, sf_dir):
    df = QUERIES["flagship_serving_index"](spark, sf_dir)
    assert df.count() > 0
    assert df.columns == [
        "dre_cd",
        "ship_dt",
        "segment",
        "prio_open",
        "prio_closed",
        "score",
        "qty",
    ]


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    """The t-digest approximation must land within 2% of the exact
    interpolated percentiles per group."""
    from data_engineering_spark.registry import QUERIES

    exact = {
        r.l_returnflag: (r.p50, r.p90)
        for r in QUERIES["a15_percentiles"](spark, sf_dir).collect()
    }
    approx = {
        r.l_returnflag: (r.p50, r.p90)
        for r in QUERIES["a17_percentiles_approx"](spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for k in exact:
        for e, a in zip(exact[k], approx[k]):
            assert abs(a - e) / e < 0.02, (k, e, a)


def test_derived_partsupp_invariants(spark, sf_dir):
    """The partsupp surrogate must behave like the dbgen relation: exactly
    4 rows per part, distinct in-range suppliers, positive quantities and
    costs — and be joinable from lineitem's (partkey, suppkey) pairs."""
    from pyspark.sql import functions as F

    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.queries_tpch_ps import derived_partsupp

    ps = derived_partsupp(spark, sf_dir)
    n_part = load_table(spark, sf_dir, "part").count()
    n_supp = load_table(spark, sf_dir, "supplier").count()
    assert ps.count() == 4 * n_part
    per = ps.groupBy("ps_partkey").agg(
        F.count(F.lit(1)).alias("n"), F.count_distinct("ps_suppkey").alias("nd")
    )
    assert per.filter("n != 4 OR nd != 4").count() == 0
    assert ps.filter((F.col("ps_suppkey") < 0) | (F.col("ps_suppkey") >= n_supp)).count() == 0
    assert ps.filter("ps_availqty <= 0 OR ps_supplycost <= 0").count() == 0
    li = load_table(spark, sf_dir, "lineitem")
    hits = li.join(
        ps, (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey)
    ).count()
    assert hits > 0  # q9's join path is non-vacuous


def test_query_string_rank_fuzzy_boost_semantics(spark):
    """ES query_string knob surface on a planted corpus: exact terms at
    fuzziness=0, misspellings recovered at fuzziness=1, and a boosted
    field dominating the ranking."""
    from data_engineering_spark.operators.text import query_string_rank

    df = spark.createDataFrame(
        [
            (1, "spark runs fast", "web"),
            (2, "sprk runs slow", "web"),      # 'sprk' is 1 edit from 'spark'
            (3, "nothing relevant here", "docs"),  # 'docs' 1 edit from 'doc'
        ],
        "doc_id long, text string, source string",
    )
    exact = query_string_rank(df, ["spark"], {"text": 1}, fuzziness=0, k=10)
    assert [r.doc_id for r in exact.collect()] == [1]
    fuzzy = query_string_rank(df, ["spark"], {"text": 1}, fuzziness=1, k=10)
    assert {r.doc_id for r in fuzzy.collect()} == {1, 2}
    boosted = query_string_rank(
        df, ["spark", "doc"], {"text": 1, "source": 10}, fuzziness=1, k=10
    ).collect()
    # doc 3 matches only via the boosted source field but must outrank
    # the text-only matches
    assert boosted[0].doc_id == 3 and boosted[0].score == 10


def test_query_string_rank_validates_inputs(spark):
    """r6 ADVICE: empty fields → clear ValueError (not IndexError); a
    dict-valued fuzziness defaults missing fields to exact match and
    rejects keys that name no field."""
    import pytest

    from data_engineering_spark.operators.text import query_string_rank

    df = spark.createDataFrame(
        [(1, "spark runs fast", "web"), (2, "sprk here", "web")],
        "doc_id long, text string, source string",
    )
    with pytest.raises(ValueError, match="at least one"):
        query_string_rank(df, ["spark"], {})
    with pytest.raises(ValueError, match="not in `fields`"):
        query_string_rank(df, ["spark"], {"text": 1}, fuzziness={"nope": 1})
    # 'text' missing from the dict → fuzziness 0 for it: doc 2's 'sprk'
    # (1 edit away) must NOT match
    got = query_string_rank(
        df, ["spark"], {"text": 1, "source": 2}, fuzziness={"source": 1}, k=10
    )
    assert [r.doc_id for r in got.collect()] == [1]


def test_significant_terms_surfaces_slice_specific_vocabulary(spark):
    from pyspark.sql import functions as F

    from data_engineering_spark.operators.text import significant_terms

    # "kubernetes" is exclusive to the fg slice; "the" is uniform noise.
    fg = [(i, "the kubernetes cluster scaled the pods") for i in range(1, 5)]
    bg = [(i, "the report summarized the quarterly numbers") for i in range(5, 21)]
    df = spark.createDataFrame(fg + bg, "doc_id long, text string")
    got = significant_terms(
        df, F.col("doc_id") <= 4, k=5, min_doc_count=3
    ).collect()
    terms = [r["term"] for r in got]
    # the slice-exclusive vocabulary fills the top ranks...
    assert set(terms[:4]) == {"kubernetes", "cluster", "pods", "scaled"}
    top = {r["term"]: r for r in got}
    kube = top["kubernetes"]
    assert kube["fg_docs"] == 4 and kube["bg_docs"] == 4
    assert kube["jlh_micro"] > 0
    # ...while a term uniform across fg and bg scores exactly zero
    assert top["the"]["jlh_micro"] == 0


def test_more_like_this_prefers_shared_rare_terms(spark):
    from data_engineering_spark.operators.text import more_like_this

    df = spark.createDataFrame(
        [
            (1, "quantum entanglement drives the qubit decoherence study"),
            (2, "entanglement and qubit decoherence in quantum systems"),
            (3, "the annual budget drives the quarterly review"),
            (4, "quantum mechanics without the jargon"),
        ],
        "doc_id long, text string",
    )
    got = more_like_this(df, like_id=1, k=3).collect()
    ranked = [r["doc_id"] for r in got]
    # doc 2 shares four rare terms; doc 4 one; doc 3 only stopwords
    assert ranked[0] == 2
    assert got[0]["n_matched_terms"] >= 4
    assert ranked.index(2) < ranked.index(4)


def test_percolate_bool_must_semantics(spark):
    from data_engineering_spark.operators.text import percolate

    df = spark.createDataFrame(
        [
            (1, "error in payment service timeout"),
            (2, "payment succeeded for order nine"),
            (3, "timeout waiting on error channel"),
        ],
        "doc_id long, text string",
    )
    stored = {
        "alert_err_timeout": ["error", "timeout"],
        "alert_payment": ["payment"],
        "alert_none": ["segfault"],
    }
    got = {(r["query_id"], r["doc_id"]) for r in percolate(df, stored).collect()}
    assert got == {
        ("alert_err_timeout", 1),
        ("alert_err_timeout", 3),
        ("alert_payment", 1),
        ("alert_payment", 2),
    }


def test_highlight_snippet_window_and_tags(spark):
    from data_engineering_spark.operators.text import highlight_snippets

    df = spark.createDataFrame(
        [
            (1, "needle at the start of it all"),
            (2, "a needle appears here and a needle appears there"),
            (3, "no match at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           highlight_snippets(df, "needle", k=5, window=5).collect()}
    assert 3 not in got
    # two hits outrank one; snippet clips at text start and wraps the match
    assert got[2]["n_hits"] == 2 and got[1]["n_hits"] == 1
    assert got[1]["snippet"] == "<em>needle</em> at t"
    assert got[2]["snippet"] == "a <em>needle</em> appe"


def test_highlight_and_percolate_literal_term_handling(spark):
    """Review regressions: highlight must treat the term as a LITERAL
    (regex metacharacters) and lowercase it; percolate must normalize
    stored terms so mixed-case alerts still fire."""
    from data_engineering_spark.operators.text import highlight_snippets, percolate

    df = spark.createDataFrame(
        [(1, "we wrote c++ here and more c++ there"), (2, "plain c only")],
        "doc_id long, text string",
    )
    got = highlight_snippets(df, "C++", k=5, window=4).collect()
    assert [r["doc_id"] for r in got] == [1]
    assert got[0]["n_hits"] == 2
    assert "<em>c++</em>" in got[0]["snippet"]

    fired = {(r["query_id"], r["doc_id"])
             for r in percolate(df, {"alert_cpp": ["C++", "Wrote"]}).collect()}
    assert fired == {("alert_cpp", 1)}
