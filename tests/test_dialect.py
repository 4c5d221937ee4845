"""Dialect shim tests: the reference's Redshift SQL text runs on Spark
after rewriting (SURVEY §4 — nvl/to_char/listagg/$$ UNLOAD)."""

from __future__ import annotations

from data_engineering_spark.catalog import register_views
from data_engineering_spark.functions.dialect import parse_unload, rewrite_redshift_sql


def test_to_char_rewrite():
    out = rewrite_redshift_sql("select to_char(f.platform_dt,'YYYYMMDD') as dt from t")
    assert "date_format(f.platform_dt, 'yyyyMMdd')" in out


def test_listagg_rewrite():
    out = rewrite_redshift_sql("select listagg(distinct trng_dvsn_cd, ',') from t group by k")
    assert "array_join(array_sort(collect_set(trng_dvsn_cd)), ',')" in out


def test_unload_parse():
    spec = parse_unload(
        "UNLOAD ($$ select 1 as x $$) TO 's3://bkt/path' json parallel OFF gzip allowoverwrite"
    )
    assert spec.sql.strip() == "select 1 as x"
    assert spec.target == "s3://bkt/path"
    assert spec.options == {
        "format": "json",
        "parallel": "off",
        "compression": "gzip",
        "mode": "overwrite",
    }


def test_reference_style_sql_executes(spark, sf_dir):
    """A reference-shaped Redshift query (Elastic_indexing.py:133-147
    pattern) runs verbatim through the shim + spark.sql."""
    register_views(spark, sf_dir)
    redshift_sql = """
        select o_custkey,
               listagg(distinct o_orderpriority, ',') as prio,
               to_char(max(o_orderdate), 'YYYYMMDD') as last_dt,
               nvl(max(o_totalprice), 0.0) as max_total
        from orders
        where o_orderstatus = 'O'
        group by o_custkey;
    """
    df = spark.sql(rewrite_redshift_sql(redshift_sql))
    rows = df.limit(5).collect()
    assert rows
    assert set(df.columns) == {"o_custkey", "prio", "last_dt", "max_total"}


# ---------------------------------------------------------------------------
# Property-based: the rewriter must be stable on arbitrary identifier /
# format inputs, idempotent, and must never touch SQL outside its dialect
# surface.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}(\.[a-z][a-z0-9_]{0,10})?", fullmatch=True)


@given(col=_ident, sep=st.sampled_from([",", ";", "|", ", "]))
@settings(max_examples=50, deadline=None)
def test_listagg_rewrite_any_identifier(col, sep):
    out = rewrite_redshift_sql(f"select listagg(distinct {col}, '{sep}') from t group by k")
    assert f"array_join(array_sort(collect_set({col})), '{sep}')" in out
    assert "listagg" not in out.lower()


@given(col=_ident, fmt=st.sampled_from(["YYYYMMDD", "YYYY-MM-DD", "YYYYMM", "YYYY"]))
@settings(max_examples=50, deadline=None)
def test_to_char_rewrite_any_identifier(col, fmt):
    out = rewrite_redshift_sql(f"select to_char({col}, '{fmt}') from t")
    assert "to_char" not in out.lower()
    assert "date_format(" in out


@given(
    sql=st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs"), whitelist_characters=",.*=<>()"),
        max_size=200,
    )
)
@settings(max_examples=100, deadline=None)
def test_rewrite_idempotent_and_conservative(sql):
    """One pass is a fixed point, and text with none of the dialect tokens
    passes through unchanged (modulo whitespace/';' trimming)."""
    once = rewrite_redshift_sql(sql)
    assert rewrite_redshift_sql(once) == once
    lowered = sql.lower()
    if not any(tok in lowered for tok in ("listagg", "to_char", "getdate", "sysdate")):
        assert once == sql.strip().rstrip(";")


def test_rebuild_timestamp_null_part_yields_null(spark):
    """A NULL date or time part must yield NULL (the reference's `||`
    propagates NULL) — the old concat_ws SKIPPED the null, handing
    to_timestamp a bare date that ANSI mode rejects at runtime (r12
    functions review)."""
    from data_engineering_spark.functions.scalar import rebuild_timestamp

    df = spark.createDataFrame(
        [("20240101", "10:30:00"), ("20240101", None), (None, "10:30:00")],
        "d string, t string",
    )
    got = [r[0] for r in df.select(rebuild_timestamp("d", "t")).collect()]
    assert got[0] is not None and got[1] is None and got[2] is None
