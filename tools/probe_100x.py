"""Targeted 100× probes for SCALE.md §6b rows (min-of-2, warm session).

Usage: python tools/probe_100x.py [sf_dir] NAME [NAME ...]

Unlike scale_sweep (coarse, one-shot, whole registry), this times a
NAMED subset the way the SCALE.md protocol requires: warm session, two
runs per query, min reported. Run on an idle box.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/tmp/sf10_synth"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    import __spark_entry__ as entrymod
    from data_engineering_spark.session import get_spark

    spark = get_spark("probe-100x")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    out: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        runs = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            spark.catalog.clearCache()
        out[name] = round(min(runs), 2)
        print(f"{name}: {out[name]}s  (runs: {[round(r,2) for r in runs]})", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "min_of_2": out}))


if __name__ == "__main__":
    main()
