"""Readers (S3/S6/S7) round-trips with explicit schemas."""

from __future__ import annotations

from pyspark.sql import types as T

from data_engineering_spark.pipeline.etl import set_nullable_for_columns
from data_engineering_spark.sources.readers import read_csv, read_json_lines, read_with_schema


def test_read_csv_explicit_schema(spark, tmp_path):
    p = str(tmp_path / "counts.csv")
    with open(p, "w") as f:
        f.write("date,hr_emp_center,hr_dty_rcmd_emp\n2024-01-01,100,200\n2024-01-02,110,210\n")
    schema = T.StructType(
        [
            T.StructField("date", T.StringType()),
            T.StructField("hr_emp_center", T.LongType()),
            T.StructField("hr_dty_rcmd_emp", T.LongType()),
        ]
    )
    df = read_csv(spark, p, schema)
    assert df.count() == 2
    assert [f.dataType for f in df.schema.fields][1] == T.LongType()


def test_read_json_lines_gzip(spark, tmp_path):
    import gzip

    p = str(tmp_path / "part.json.gz")
    with gzip.open(p, "wt") as f:
        f.write('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    df = read_json_lines(spark, p)
    assert df.count() == 2
    assert {r.b for r in df.collect()} == {"x", "y"}


def test_read_with_overridden_schema(spark, sf_dir):
    base = spark.read.parquet(f"{sf_dir}/nation.parquet")
    relaxed = set_nullable_for_columns(base.schema, True)
    df = read_with_schema(spark, f"{sf_dir}/nation.parquet", relaxed)
    assert df.count() == 25
    assert all(f.nullable for f in df.schema.fields)


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    from data_engineering_spark.catalog import load_table
    from data_engineering_spark.sources.readers import read_orc, write_orc

    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert sorted(r.n_nationkey for r in back.collect()) == sorted(
        r.n_nationkey for r in src.collect()
    )
    # predicate pushdown reaches the ORC scan
    plan = back.filter(back.n_nationkey == 3)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan or "n_nationkey" in plan
