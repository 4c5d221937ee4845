"""Job-runner CLI — the engine's replacement for the reference's
Airflow → Glue dispatch (Airflow_week.py:159-216): same jobs, one
process, exit code = job success.

Usage:
    python tools/run_job.py daily BATCH_DATE [--weekly] [--warehouse DIR] [--sf-dir DIR]
    python tools/run_job.py sql  TARGET_TABLE SQL_FILE [--warehouse DIR] [--sf-dir DIR]

`daily` runs the full tiered pipeline (t1 SQL ETL → t2 mart → retention
→ optional serving index). `sql` runs one Redshift-dialect SQL file into
a warehouse table — the AWS_GLUE_ETL.py shape with the SQL file on local
disk instead of S3.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_daily = sub.add_parser("daily")
    p_daily.add_argument("batch_date")
    p_daily.add_argument("--weekly", action="store_true")

    p_sql = sub.add_parser("sql")
    p_sql.add_argument("target_table")
    p_sql.add_argument("sql_file")

    for p in (p_daily, p_sql):
        p.add_argument("--warehouse", default="/tmp/dews_warehouse")
        p.add_argument("--sf-dir", default="/root/testdata/sf0.001")

    args = ap.parse_args()

    from data_engineering_spark.catalog import register_views
    from data_engineering_spark.session import get_spark

    spark = get_spark("run-job")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "daily":
        from data_engineering_spark.pipeline.daily import run_daily

        recs = run_daily(
            spark, args.sf_dir, args.warehouse, args.batch_date, weekly=args.weekly
        )
        out = [
            {"job": r.job_nm, "rows": r.cretn_cnt, "ok": r.success_yn == "Y", "error": r.error_msg}
            for r in recs
        ]
        print(json.dumps(out, indent=2))
        return 0 if all(r.success_yn == "Y" for r in recs) else 1

    register_views(spark, args.sf_dir)
    from data_engineering_spark.pipeline.etl import run_sql_etl

    with open(args.sql_file) as fh:
        sql_text = fh.read()
    rec = run_sql_etl(
        spark,
        sql_text,
        f"{args.warehouse}/{args.target_table}",
        job_nm=f"sql.{args.target_table}",
        audit_dir=f"{args.warehouse}/audit_log",
    )
    print(json.dumps({"job": rec.job_nm, "rows": rec.cretn_cnt, "ok": rec.success_yn == "Y", "error": rec.error_msg}))
    return 0 if rec.success_yn == "Y" else 1


if __name__ == "__main__":
    sys.exit(main())
