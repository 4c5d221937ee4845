"""Local mini-driver: run every queries() entry at sf0.01 and compare to
its DuckDB oracle the same way the round driver does (row count + sorted-
column value comparison). Usage:

    python tools/check_correctness.py [--exact] [name ...]

``--exact`` compares float columns bit-exactly (NaN==NaN) instead of
``allclose(atol=1e-9)`` — the round driver hashes exact values, so local
green under tolerance is NOT driver green for any query whose output
schema contains doubles. Exact mode is the round-end gate; the tolerant
default remains useful only while iterating on a known-inexact oracle.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "tolist") else v
            )
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(
    name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame, exact: bool = False
) -> str:
    if len(spark_df) != len(oracle_df):
        return f"ROWS {len(spark_df)} vs {len(oracle_df)}"
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return f"COLS {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    a, b = canon(spark_df), canon(oracle_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                import numpy as np

                atol = 0.0 if exact else 1e-9
                if not np.allclose(
                    av.astype(float).fillna(-1e308), bv.astype(float).fillna(-1e308), rtol=0, atol=atol
                ):
                    bad = (av.astype(float).fillna(-1e308) - bv.astype(float).fillna(-1e308)).abs().idxmax()
                    return f"VALUES col={c} e.g. {av[bad]!r} vs {bv[bad]!r}"
            else:
                if not av.astype(str).equals(bv.astype(str)):
                    neq = av.astype(str) != bv.astype(str)
                    i = neq.idxmax()
                    return f"VALUES col={c} row{i}: {av[i]!r} vs {bv[i]!r}"
        except Exception as e:  # noqa: BLE001
            return f"CMPERR col={c}: {e}"
    return "OK"


def main() -> int:
    import __spark_entry__ as entrymod
    from data_engineering_spark.session import get_spark

    spark = get_spark("check-correctness", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    argv = [a for a in sys.argv[1:] if a != "--exact"]
    exact = "--exact" in sys.argv[1:]
    only = set(argv)
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            # several operators persist() internally (minhash, canonical
            # assignment, tf-idf, q15); drop their blocks once the result
            # is materialized so a 94-query sweep doesn't accumulate
            # executor storage
            spark.catalog.clearCache()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ORACLE ERROR {str(e)[:300]}")
            failures += 1
            continue
        verdict = compare(name, sdf, odf, exact=exact)
        flag = "ok  " if verdict == "OK" else "FAIL"
        if verdict != "OK":
            failures += 1
        print(f"{flag} {name}: {verdict} ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
    print(f"\n{failures} failures / {len(only) if only else len(qs)} checked")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
