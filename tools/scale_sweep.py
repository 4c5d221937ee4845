"""Time EVERY registered query at a given SF and flag outliers.

Usage: python tools/scale_sweep.py [sf_dir] [--threshold SECONDS]

This is the profiling sweep that catches quadratic blowups before they
ship (it found the n-gram blocking degenerating to 179 s at sf0.1 —
see SCALE.md §6). Run it after adding or changing any operator; anything
above the threshold that is not a documented exact baseline deserves a
plan inspection with tools/plan_report.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# documented exact/quadratic oracle baselines — expected to be slow:
# dedup_embedding + sim_cosine_near_pairs are all-pairs by definition;
# dedup_ngram_exact is the blocked variant's exact twin (shared-shingle
# self-join); sim_ann_recall computes brute-force ground truth to score
# the ANN paths against.
KNOWN_BASELINES = {
    "dedup_embedding",
    "sim_cosine_near_pairs",
    "dedup_ngram_exact",
    "sim_ann_recall",
    # round-5 additions that intentionally run over an exact/quadratic
    # pair source so their fixpoint/cluster output stays oracle-able:
    "dedup_cluster_components",
    "corpus_semantic_dedup",
}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    threshold = 5.0
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1]) if "=" in a else threshold

    import __spark_entry__ as entrymod
    from data_engineering_spark.session import get_spark

    spark = get_spark("scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 2)
        except Exception as ex:  # noqa: BLE001
            errors[name] = str(ex).split("\n")[0][:200]
        spark.catalog.clearCache()

    slow = {
        k: v
        for k, v in sorted(times.items(), key=lambda kv: -kv[1])
        if v > threshold and k not in KNOWN_BASELINES
    }
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_queries": len(times),
                "total_sec": round(sum(times.values()), 1),
                "slow_over_threshold": slow,
                "known_baselines": {k: times.get(k) for k in KNOWN_BASELINES if k in times},
                "errors": errors,
            },
            indent=2,
        )
    )
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
