"""Synthesize a larger SF by key-shifted replication of driver testdata.

Usage: python tools/make_scale.py [factor] [src_sf_dir] [out_dir]
       (defaults: 10 /root/testdata/sf0.1 /tmp/sf_scaled)

Scale-STRESS data, not correctness data: each copy i shifts every
primary key and its foreign-key references by i * (max_key + 1), so join
fan-outs, key cardinalities, and group counts grow linearly with the
factor — the shape a real 10x data growth has. Correctness runs stay on
the driver's own parquet (TESTDATA.md); this exists so SCALE.md can
report how the headline plans behave one scale factor up.

region/nation stay fixed (bounded dims at every real SF). Event
timestamps shift by 366 days per copy so time-window aggregates grow in
range, not in per-window density.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

# table -> (primary key col, {fk col -> referenced table})
KEYED = {
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": (
        "l_orderkey",  # shifted with orders so the FK stays valid
        {"l_partkey": "part", "l_suppkey": "supplier"},
    ),
    "events": ("event_id", {}),
    "documents": ("doc_id", {}),
    "embeddings": ("vec_id", {}),
}
FIXED = ("region", "nation")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf_scaled"

    from data_engineering_spark.catalog import TABLES, load_table
    from data_engineering_spark.session import get_spark

    spark = get_spark("make-scale")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    offsets: dict[str, int] = {}
    for t in KEYED:
        pk = KEYED[t][0]
        offsets[t] = load_table(spark, src, t).agg(F.max(pk)).first()[0] + 1
    # lineitem rides orders' key space
    offsets["lineitem"] = offsets["orders"]

    for t in TABLES:
        df = load_table(spark, src, t)
        if t in FIXED:
            df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
            continue
        pk, fks = KEYED[t]
        copies: list[DataFrame] = []
        for i in range(factor):
            c = df.withColumn(pk, F.col(pk) + F.lit(i * offsets[t]))
            for fk, ref in fks.items():
                c = c.withColumn(fk, F.col(fk) + F.lit(i * offsets[ref]))
            if t == "events":
                c = c.withColumn(
                    "ts", F.expr(f"timestampadd(DAY, {i * 366}, ts)")
                )
            copies.append(c)
        scaled = copies[0]
        for c in copies[1:]:
            scaled = scaled.unionByName(c)
        scaled.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
        print(f"{t}: x{factor}", flush=True)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
