"""Phase-2 job layer: SQL-file ETL, audit log, writers, validation gates."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_engineering_spark.catalog import register_views
from data_engineering_spark.pipeline.etl import (
    AUDIT_SCHEMA,
    count_reconciliation_gate,
    run_sql_etl,
    schema_match,
    set_nullable_for_columns,
)
from data_engineering_spark.sources.writers import (
    partition_overwrite,
    retention_prune,
    truncate_and_load,
    write_unload,
)


def test_run_sql_etl_truncate(spark, sf_dir, tmp_path):
    register_views(spark, sf_dir)
    target = str(tmp_path / "t1_orders_summary")
    audit = str(tmp_path / "audit")
    # reference-dialect SQL (to_char + nvl + listagg) straight through the shim
    rec = run_sql_etl(
        spark,
        """select o_custkey, listagg(distinct o_orderstatus, ',') as statuses,
                  to_char(max(o_orderdate), 'YYYYMMDD') as last_dt
           from orders group by o_custkey;""",
        target,
        job_nm="t1_orders_summary",
        bat_dt="20240101",
        audit_dir=audit,
    )
    assert rec.success_yn == "Y"
    assert rec.cretn_cnt > 0
    out = spark.read.parquet(target)
    assert set(out.columns) == {"o_custkey", "statuses", "last_dt"}
    audit_df = spark.read.parquet(audit)
    assert audit_df.schema == AUDIT_SCHEMA
    assert audit_df.count() == 1
    # idempotent re-run: truncate semantics → same count, audit appends
    rec2 = run_sql_etl(spark, "select * from nation", target, audit_dir=audit)
    assert rec2.cretn_cnt == 25
    assert spark.read.parquet(audit).count() == 2


def test_run_sql_etl_error_is_audited(spark, tmp_path):
    rec = run_sql_etl(spark, "select * from no_such_table", str(tmp_path / "x"))
    assert rec.success_yn == "N"
    assert rec.error_msg
    assert rec.cretn_cnt == 0


def test_partition_overwrite_idempotent(spark, sf_dir, tmp_path):
    target = str(tmp_path / "backup")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    d1 = orders.limit(100).withColumn("bkup_dt", F.lit("20240101"))
    d2 = orders.limit(50).withColumn("bkup_dt", F.lit("20240102"))
    partition_overwrite(d1, target, "bkup_dt")
    partition_overwrite(d2, target, "bkup_dt")
    assert spark.read.parquet(target).count() == 150
    # re-run day 2 with fewer rows → replaces ONLY that partition
    d2b = orders.limit(10).withColumn("bkup_dt", F.lit("20240102"))
    partition_overwrite(d2b, target, "bkup_dt")
    got = dict(
        spark.read.parquet(target).groupBy("bkup_dt").count().rdd.map(tuple).collect()
    )
    assert got == {"20240101": 100, "20240102": 10}


def test_retention_prune(spark, sf_dir, tmp_path):
    target = str(tmp_path / "retained")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(30)
    for d in ("20231229", "20231230", "20240102"):
        partition_overwrite(orders.withColumn("bkup_dt", F.lit(d)), target, "bkup_dt")
    dropped = retention_prune(spark, target, "bkup_dt", cutoff="20240101")
    assert dropped == ["20231229", "20231230"]
    remaining = [r.bkup_dt for r in spark.read.parquet(target).select("bkup_dt").distinct().collect()]
    assert remaining == ["20240102"]


def test_write_unload_single_gzip_json(spark, sf_dir, tmp_path):
    path = str(tmp_path / "unload")
    write_unload(spark.read.parquet(f"{sf_dir}/nation.parquet"), path)
    files = [f for f in os.listdir(path) if f.endswith(".json.gz")]
    assert len(files) == 1  # parallel OFF → exactly one gzip part
    assert spark.read.json(path).count() == 25  # codec round-trip


def test_schema_tools(spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    relaxed = set_nullable_for_columns(nation.schema, True)
    assert all(f.nullable for f in relaxed.fields)
    backup = nation.select(F.lit("20240101").alias("bkup_dt"), "*")
    assert schema_match(nation, backup)
    assert not schema_match(nation.drop("n_name"), backup)
    assert count_reconciliation_gate(25, nation)
    assert not count_reconciliation_gate(24, nation)


def test_truncate_and_load_atomic_replace(spark, sf_dir, tmp_path):
    target = str(tmp_path / "t")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    assert truncate_and_load(nation, target) == 25
    assert truncate_and_load(nation.limit(5), target) == 5  # truncate, not append


def test_run_daily_end_to_end(spark, sf_dir, tmp_path):
    """§3.1 DAG re-enactment: t1 SQL ETL → t2 mart partition →
    retention → weekly serving index, audited, idempotent on re-run."""
    from data_engineering_spark.pipeline.daily import run_daily

    wh = str(tmp_path / "wh")
    recs = run_daily(spark, sf_dir, wh, "20240110", weekly=True)
    assert [r.job_nm for r in recs] == [
        "t1.t1_order_summary",
        "t1.t1_lineitem_daily",
        "t2.cust_mart",
        "t4.serving_index",
    ]
    assert all(r.success_yn == "Y" for r in recs)
    mart = spark.read.parquet(f"{wh}/t2_cust_mart")
    assert mart.filter("bkup_dt = '20240110'").count() == recs[2].cretn_cnt > 0

    # re-run same date: idempotent (partition replaced, not doubled)
    recs2 = run_daily(spark, sf_dir, wh, "20240110", weekly=False)
    mart2 = spark.read.parquet(f"{wh}/t2_cust_mart")
    assert mart2.filter("bkup_dt = '20240110'").count() == recs2[2].cretn_cnt

    # second batch date adds a partition; retention keeps both (within window)
    run_daily(spark, sf_dir, wh, "20240111", weekly=False)
    parts = {r.bkup_dt for r in spark.read.parquet(f"{wh}/t2_cust_mart").select("bkup_dt").distinct().collect()}
    assert parts == {"20240110", "20240111"}

    audit = spark.read.parquet(f"{wh}/audit_log")
    assert audit.filter("success_yn = 'Y'").count() >= 9


def test_retention_cutoff_crosses_month_boundary(spark, sf_dir, tmp_path):
    """Cutoff must use real date arithmetic: integer yyyyMMdd subtraction
    around a month boundary (20240201 - 7 = '20240194') lexically exceeds
    every January partition and would prune data inside the window."""
    from data_engineering_spark.pipeline.daily import run_daily

    wh = str(tmp_path / "wh")
    run_daily(spark, sf_dir, wh, "20240129", weekly=False)
    run_daily(spark, sf_dir, wh, "20240201", weekly=False, keep_days=7)
    parts = {
        r.bkup_dt
        for r in spark.read.parquet(f"{wh}/t2_cust_mart").select("bkup_dt").distinct().collect()
    }
    # 20240129 is 3 days before 20240201 — well inside keep_days=7
    assert parts == {"20240129", "20240201"}
