"""Dump the BPE trainer's count-pass physical plan (the operator the
r14 optimization changed — the trainer queries themselves return a
driver-local merge table, so their end plan is a LocalTableScan and the
evidence lives in the per-pass count plan).

Usage: python tools/dump_bpe_count_plan.py OUTFILE
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402

from data_engineering_spark.catalog import load_table  # noqa: E402
from data_engineering_spark.operators.text import (  # noqa: E402
    _bpe_pair_counts,
    _bpe_seg0,
)
from data_engineering_spark.session import get_spark  # noqa: E402


def main() -> None:
    out = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-bpe-count-plan")
    spark.sparkContext.setLogLevel("ERROR")
    df = load_table(spark, sf_dir, "documents")
    segdf = df.select(_bpe_seg0("text").alias("seg")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    segdf.count()
    q = _bpe_pair_counts(segdf).limit(64)
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    with open(out, "w") as f:
        f.write(plan)
    print(f"wrote {out} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
