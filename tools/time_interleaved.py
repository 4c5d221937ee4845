"""Interleaved round-robin timing — the noise-proof way to compare
queries within ONE session.

Usage: python tools/time_interleaved.py [sf_dir] NAME [NAME ...]
       (default sf_dir: /root/testdata/sf0.1; rounds via AB_ROUNDS, default 3)

Why this exists: cross-session timings for sub-3s queries are NOT
comparable — the same code has measured 1.6/2.4/2.8/2.9 s across
sessions (JIT state, Python-worker pool warmth, OS cache, box load all
differ), and every round a couple of untouched queries "drift" 1.3×
in the bench only to un-drift when re-timed. Sequential min-of-2 in a
fresh session (tools/time_queries.py) inherits that session's warmth
bias whole. Interleaving the candidates ROUND-ROBIN inside one session
gives every query the same warmth trajectory, so the min-of-rounds
DELTA between them is trustworthy even when the absolute numbers are
not. This is the protocol the round rhythm prescribes for adjudicating
bench movers and for before/after operator comparisons where both forms
are registered (production query vs its portable twin, old vs new shape
registered side by side).

Each timing run writes to a noop sink (full execution, no collect cost)
and clears the cache after, so later rounds never read an earlier
round's persisted state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    if not names:
        print(__doc__)
        sys.exit(2)

    import __spark_entry__ as entrymod
    from data_engineering_spark.session import get_spark

    spark = get_spark("ab-interleaved")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    for n in names:
        if n not in queries:
            sys.exit(f"unknown query: {n}")

    # one untimed warmup pass so round 1 measures execution, not codegen
    for n in names:
        queries[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(rounds):
        for n in names:
            t0 = time.time()
            queries[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs[n].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
    out = {
        "sf_dir": sf_dir,
        "rounds": rounds,
        "protocol": "interleaved round-robin, warmup pass untimed, min reported",
        "min": {n: min(v) for n, v in runs.items()},
        "runs": runs,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
