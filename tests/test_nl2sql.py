"""UD4 — deterministic NL→SQL template layer (the reference's LLM
NL→Elasticsearch flow, Openapi/openai_elasticsearch.py, minus the model:
one request → one validated query → execution)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.functions.nl2sql import NLQueryError, compile_nl, run_nl

SCHEMAS = {
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
    "events": ["event_id", "ts", "user_id", "event_type", "value"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
}


def test_compile_count_and_filters():
    assert compile_nl("count orders", SCHEMAS) == "SELECT count(*) AS n FROM orders"
    sql = compile_nl("count rows in events where event_type = click and value > 5", SCHEMAS)
    assert sql == "SELECT count(*) AS n FROM events WHERE event_type = 'click' AND value > 5"


def test_compile_agg_by_show_top():
    sql = compile_nl("average o_totalprice by o_orderstatus in orders", SCHEMAS)
    assert sql == (
        "SELECT o_orderstatus, avg(o_totalprice) AS avg_o_totalprice "
        "FROM orders GROUP BY o_orderstatus"
    )
    sql = compile_nl("total value by event_type in events top 3", SCHEMAS)
    # dims appended as tiebreakers so the LIMIT cutoff is deterministic
    assert sql.endswith("ORDER BY sum_value DESC, event_type LIMIT 3")
    sql = compile_nl("show o_orderkey, o_totalprice from orders where o_totalprice >= 100 limit 7", SCHEMAS)
    assert sql == (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice >= 100 LIMIT 7"
    )
    assert compile_nl("top 2 orders by o_totalprice", SCHEMAS) == (
        "SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 2"
    )
    # contains → LIKE, with quote escaping
    sql = compile_nl("show event_type from events where event_type contains li'ck", SCHEMAS)
    assert "LIKE '%li''ck%' ESCAPE '!'" in sql


def test_contains_escapes_like_wildcards():
    """% and _ in a 'contains' value must match literally, not as LIKE
    wildcards ('!' escape reads identically in Spark SQL and DuckDB)."""
    sql = compile_nl("show event_type from events where event_type contains 50%_a!b", SCHEMAS)
    assert "LIKE '%50!%!_a!!b%' ESCAPE '!'" in sql


def test_is_null_predicates():
    sql = compile_nl("count events where value is null", SCHEMAS)
    assert sql == "SELECT count(*) AS n FROM events WHERE value IS NULL"
    sql = compile_nl("count events where value is not null", SCHEMAS)
    assert sql == "SELECT count(*) AS n FROM events WHERE value IS NOT NULL"
    # 'is' / 'is not' against a non-null value keep equality semantics
    sql = compile_nl("count events where event_type is click", SCHEMAS)
    assert sql == "SELECT count(*) AS n FROM events WHERE event_type = 'click'"
    sql = compile_nl("count events where event_type is not click", SCHEMAS)
    assert sql == "SELECT count(*) AS n FROM events WHERE event_type <> 'click'"


def test_compile_between_range():
    """'between A and B' is one range term — the splitter must not break
    it on the range's own 'and', even when composed with more terms."""
    sql = compile_nl("count events where value between 5 and 10", SCHEMAS)
    assert sql == "SELECT count(*) AS n FROM events WHERE value BETWEEN 5 AND 10"
    sql = compile_nl(
        "total value by event_type in events "
        "where value between 5 and 10 and event_type = click",
        SCHEMAS,
    )
    assert "WHERE value BETWEEN 5 AND 10 AND event_type = 'click'" in sql


def test_compile_between_malformed_does_not_swallow_next_term():
    """A malformed range ('value between 5 and user_id = 3') must error on
    its own term instead of consuming the following predicate as its upper
    bound (r6 ADVICE): the re-join only fires when the next raw term is a
    bare value token."""
    with pytest.raises(NLQueryError, match="cannot parse condition term"):
        compile_nl("count events where value between 5 and user_id = 3", SCHEMAS)
    # a well-formed range followed by more predicates still re-joins
    sql = compile_nl(
        "count events where value between 5 and 10 and user_id = 3", SCHEMAS
    )
    assert "value BETWEEN 5 AND 10 AND user_id = 3" in sql


def test_compile_join_intent():
    """'with its DIM info' compiles the reference's cross-index lookup
    (search hits + keyed fetch of a second index's fields,
    Openapi/openai_elasticsearch.py:224-292) to ONE broadcast lookup
    join; the key pair comes from the schemas, never the text."""
    sql = compile_nl(
        "show o_orderkey, o_totalprice from orders "
        "where o_totalprice > 100 with its customer info",
        SCHEMAS,
    )
    assert "JOIN customer d ON f.o_custkey = d.c_custkey" in sql
    assert "/*+ BROADCAST(d) */" in sql
    assert "WHERE f.o_totalprice > 100" in sql  # cond binds to the fact side
    # every dim column merges into the result (the reference's _source list)
    for c in SCHEMAS["customer"]:
        assert f"d.{c}" in sql
    # 'its' is optional; unknown tables/columns still rejected
    assert "JOIN" in compile_nl("show o_orderkey from orders with customer info", SCHEMAS)
    with pytest.raises(NLQueryError, match="unknown table"):
        compile_nl("show o_orderkey from orders with its nope info", SCHEMAS)
    with pytest.raises(NLQueryError, match="unknown column"):
        compile_nl("show bogus from orders with its customer info", SCHEMAS)


def test_compile_join_intent_dedups_colliding_columns():
    """Identical-name key convention (doc_id ↔ doc_id): the dim's copy
    of the join key is redundant (equal to the selected fact column on
    an inner join) and must be dropped, and any other same-named dim
    column must come back under a dim-prefixed alias — duplicate output
    names are ambiguous downstream and break a by-name compare."""
    schemas = dict(
        SCHEMAS,
        chunks=["doc_id", "text"],
        docmeta=["doc_id", "lang", "text"],
    )
    sql = compile_nl("show doc_id, text from chunks with its docmeta info", schemas)
    select_list = sql.split(" FROM ")[0]
    assert "f.doc_id" in select_list and "f.text" in select_list
    assert "d.doc_id" not in select_list  # redundant join-key copy dropped
    assert "d.text AS docmeta_text" in select_list  # collision aliased, value kept
    assert "d.lang" in select_list
    assert "ON f.doc_id = d.doc_id" in sql
    # key not selected → the dim copy is the only one, keep it plain
    sql2 = compile_nl("show text from chunks with its docmeta info", schemas)
    assert "d.doc_id" in sql2.split(" FROM ")[0]


def test_compile_join_intent_requires_unique_key():
    """Zero key candidates (or several) must raise, not guess."""
    with pytest.raises(NLQueryError, match="cannot infer a unique join key"):
        compile_nl("show event_id from events with its orders info", SCHEMAS)
    two_keys = dict(
        SCHEMAS,
        lineitem=["l_orderkey", "l_partkey", "l_extendedprice"],
        bridge=["b_orderkey", "b_partkey"],
    )
    with pytest.raises(NLQueryError, match="candidates \\["):
        compile_nl("show l_extendedprice from lineitem with its bridge info", two_keys)


def test_compile_count_distinct_by():
    sql = compile_nl("count distinct user_id by event_type in events", SCHEMAS)
    assert sql == (
        "SELECT event_type, count(DISTINCT user_id) AS n_distinct_user_id "
        "FROM events GROUP BY event_type"
    )
    sql = compile_nl(
        "count unique user_id by event_type in events where value > 0 top 2", SCHEMAS
    )
    assert sql.endswith("ORDER BY n_distinct_user_id DESC, event_type LIMIT 2")
    # must not shadow the plain count or the count-agg-by forms
    assert compile_nl("count events", SCHEMAS) == "SELECT count(*) AS n FROM events"
    assert "count(value)" in compile_nl("count value by event_type in events", SCHEMAS)


def test_compile_distinct_and_scalar_agg():
    sql = compile_nl("distinct event_type from events", SCHEMAS)
    assert sql == "SELECT DISTINCT event_type FROM events"
    sql = compile_nl("unique event_type, user_id in events where value > 0", SCHEMAS)
    assert sql == "SELECT DISTINCT event_type, user_id FROM events WHERE value > 0"
    sql = compile_nl("max o_totalprice in orders", SCHEMAS)
    assert sql == "SELECT max(o_totalprice) AS max_o_totalprice FROM orders"
    sql = compile_nl("average value in events where event_type = click", SCHEMAS)
    assert sql == (
        "SELECT avg(value) AS avg_value FROM events WHERE event_type = 'click'"
    )
    # the scalar form must not shadow grouped aggregation
    assert "GROUP BY" in compile_nl("average value by event_type in events", SCHEMAS)
    with pytest.raises(NLQueryError):
        compile_nl("distinct nope from events", SCHEMAS)


def test_unknown_fields_rejected():
    """The reference prompts 'avoid using fields that do not exist';
    here it's enforced."""
    with pytest.raises(NLQueryError, match="unknown table"):
        compile_nl("count nope", SCHEMAS)
    with pytest.raises(NLQueryError, match="unknown column"):
        compile_nl("average bogus by o_orderstatus in orders", SCHEMAS)
    with pytest.raises(NLQueryError, match="cannot parse"):
        compile_nl("please do something vague", SCHEMAS)


def test_compile_reports_only_referenced_tables():
    """r7 ADVICE: run_nl must register exactly the tables the compiled
    query references — resolved by the grammar (every arm returns its
    table list), never re-derived by regex over the generated SQL, so a
    table name inside a string literal registers nothing."""
    from data_engineering_spark.functions.nl2sql import _compile

    sql, tables = _compile("count rows in events where event_type = orders", SCHEMAS)
    assert "'orders'" in sql  # the other table's name, as a VALUE
    assert tables == ["events"]
    _, tables = _compile("count orders", SCHEMAS)
    assert tables == ["orders"]


def test_run_nl_matches_dataframe_api(spark, sf_dir):
    got = run_nl(spark, sf_dir, "count orders where o_orderstatus = F").collect()[0].n
    want = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").count()
    assert got == want


def test_compile_nl_never_miscompiles_garbage():
    """Totality fuzz: arbitrary word-salad either compiles to valid SQL
    for a recognized intent or raises NLQueryError — no other exception
    class, no silent mis-compile. Deterministic generator (no RNG
    state) over the grammar's keyword vocabulary and junk tokens."""
    import itertools

    from data_engineering_spark.functions.nl2sql import NLQueryError, compile_nl

    vocab = [
        "show", "count", "top", "from", "where", "with", "its", "info",
        "by", "in", "between", "and", "limit", "distinct", "orders",
        "customer", "o_orderkey", "bogus", ">", "5", "zz", ",",
    ]
    n_ok = n_err = 0
    seeds = ["count orders", "top 5 orders by o_totalprice",
             "show o_orderkey from orders with its customer info"]
    for text in itertools.chain(
        seeds,
        (" ".join(c) for c in
         itertools.islice(itertools.product(vocab, repeat=3), 0, None, 7)),
    ):
        try:
            sql = compile_nl(text, SCHEMAS)
            assert sql.upper().startswith("SELECT"), text
            n_ok += 1
        except NLQueryError:
            n_err += 1
    assert n_ok >= len(seeds) and n_err > 0  # both branches exercised


def test_compile_trend_intent():
    """ES date_histogram: calendar-bucketed aggregation with unique
    date-column inference (ambiguity errors, never guesses)."""
    sql = compile_nl("monthly count in events", SCHEMAS)
    assert sql == (
        "SELECT date_format(ts, 'yyyy-MM') AS month, count(*) AS n "
        "FROM events GROUP BY date_format(ts, 'yyyy-MM')"
    )
    sql = compile_nl("daily avg value in events where event_type = click", SCHEMAS)
    assert "date_format(ts, 'yyyy-MM-dd') AS day" in sql
    assert "avg(value) AS avg_value" in sql and "WHERE event_type = 'click'" in sql
    # explicit `by COL` overrides inference; yearly buckets format as yyyy
    sql = compile_nl("yearly total value in events by ts", SCHEMAS)
    assert "date_format(ts, 'yyyy') AS year" in sql
    # orders has NO date-like column in this schema fixture → must error
    with pytest.raises(NLQueryError, match="cannot infer"):
        compile_nl("monthly count in orders", SCHEMAS)
    with pytest.raises(NLQueryError, match="needs a measure"):
        compile_nl("monthly sum in events", SCHEMAS)
    with pytest.raises(NLQueryError, match="unknown column"):
        compile_nl("monthly count in events by bogus", SCHEMAS)


def test_compile_having_threshold():
    """ES min_doc_count / bucket-selector: `having CMP N` filters grouped
    buckets on the FULL aggregate expression."""
    sql = compile_nl("count value by event_type in events having at least 3", SCHEMAS)
    assert sql.endswith("GROUP BY event_type HAVING count(value) >= 3")
    sql = compile_nl(
        "count value by event_type in events where value > 0 having over 100 top 2",
        SCHEMAS,
    )
    assert "WHERE value > 0" in sql
    assert "HAVING count(value) > 100" in sql
    assert sql.endswith("ORDER BY count_value DESC, event_type LIMIT 2")
    # symbolic CMPs pass through the dict fallback untouched
    sql = compile_nl("max value by user_id in events having >= 9.5", SCHEMAS)
    assert sql.endswith("HAVING max(value) >= 9.5")
    sql = compile_nl("min value by user_id in events having < 2", SCHEMAS)
    assert sql.endswith("HAVING min(value) < 2")
    # float sums/avgs at a threshold boundary are order-nondeterministic:
    # the grammar refuses them rather than miscompiling
    with pytest.raises(NLQueryError, match="count/min/max only"):
        compile_nl("sum value by event_type in events having over 100", SCHEMAS)
    with pytest.raises(NLQueryError, match="count/min/max only"):
        compile_nl("avg value by user_id in events having at most 9.5", SCHEMAS)
    # the plain forms must not be shadowed
    assert "HAVING" not in compile_nl("count value by event_type in events", SCHEMAS)
    with pytest.raises(NLQueryError):
        compile_nl("count bogus by event_type in events having at least 3", SCHEMAS)
