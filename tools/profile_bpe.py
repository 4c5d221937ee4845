"""Phase-level profile of the batched BPE trainer (r14 optimization).

Times each pass's count-collect separately from the re-segmentation
persist materialization, so the 16x64 trainer's ~46 s bench row can be
attributed: pair-count agg vs replace-chain projection vs driver/codegen
fixed overhead. Read-only — no library changes.

Usage: python tools/profile_bpe.py [passes] [k]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_engineering_spark.catalog import load_table  # noqa: E402
from data_engineering_spark.operators.text import (  # noqa: E402
    _bpe_pair_counts,
    _bpe_seg0,
)
from data_engineering_spark.session import get_spark  # noqa: E402


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-bpe")
    spark.sparkContext.setLogLevel("ERROR")

    df = load_table(spark, sf_dir, "documents")
    n_docs = df.count()
    tok_stats = df.select(
        F.sum(F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))).alias("toks")
    ).collect()[0]
    print(f"docs={n_docs} total_tokens={tok_stats.toks}")

    # warm codegen/Arrow like bench does
    t0 = time.time()
    segdf = df.select(_bpe_seg0("text").alias("seg")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    segdf.count()
    print(f"seg0 persist materialize: {time.time() - t0:.3f}s")

    total_count = total_reseg = 0.0
    prev = None
    for p in range(1, passes + 1):
        t0 = time.time()
        rows = _bpe_pair_counts(segdf).limit(k).collect()
        dt_count = time.time() - t0
        if prev is not None:
            prev.unpersist()
            prev = None
        rows.sort(key=lambda r: (-r.c, r.a, r.b))
        seg = F.col("seg")
        for r in rows:
            seg = F.replace(seg, F.lit(f" {r.a}  {r.b} "), F.lit(f" {r.a}_{r.b} "))
        dt_reseg = 0.0
        if p < passes:
            prev = segdf
            segdf = segdf.select(seg.alias("seg")).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            # materialize the persist NOW so its cost is attributed to
            # the reseg phase, not smeared into the next count pass
            t0 = time.time()
            segdf.count()
            dt_reseg = time.time() - t0
        total_count += dt_count
        total_reseg += dt_reseg
        print(f"pass {p:2d}: count+collect={dt_count:.3f}s reseg_persist={dt_reseg:.3f}s")
    segdf.unpersist()
    if prev is not None:
        prev.unpersist()
    print(f"TOTAL: count={total_count:.3f}s reseg={total_reseg:.3f}s")


if __name__ == "__main__":
    main()
