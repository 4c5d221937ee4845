"""Local mini-driver: run every queries() entry at sf0.01 and compare to
its DuckDB oracle the same way the round driver does (row count + sorted-
column value comparison). Usage:

    python tools/check_correctness.py [--exact] [name ...]

``--exact`` is DRIVER-FAITHFUL: it compares ``canon(df).astype(str)``
frames — the stringify-then-hash operation the round driver performs
(``tests/test_driver_canon.py``) — after normalizing datetime columns to
ISO strings on both sides (the driver canonicalizes datetimes; five
queries have known-benign datetime64-vs-object splits that are
historically driver-green). Under string compare, a DTYPE divergence
that changes the string form (int64 ``14997`` vs float64 ``14997.0``,
the round-8/9 ``curate_token_budget`` red) fails here exactly as it
fails in the driver — numeric-equality compares cannot see it. Exact
mode is the round-end gate; the tolerant numeric default remains useful
only while iterating on a known-inexact oracle.

In BOTH modes an int-vs-float pandas dtype-kind mismatch per column is a
loud failure: DuckDB returns integer window/aggregate SUMs as HUGEINT,
which pandas materializes as float64 — an oracle defect class that must
never pass locally again (fix: CAST the SQL back to BIGINT).
"""

from __future__ import annotations

import datetime as _dt
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


def _iso(v):
    """One ISO-8601 string form for every date/datetime cell shape."""
    if v is None or v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
        return "NaT"
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day).strftime("%Y-%m-%dT%H:%M:%S.%f")
    return v


def _is_datelike(s: pd.Series) -> bool:
    if pd.api.types.is_datetime64_any_dtype(s):
        return True
    if s.dtype == object:
        nn = s.dropna()
        return len(nn) > 0 and all(
            isinstance(v, (_dt.date, _dt.datetime, pd.Timestamp)) for v in nn.head(20)
        )
    return False


def normalize_datetimes(a: pd.Series, b: pd.Series):
    """If EITHER side is date/datetime-typed, render BOTH as ISO strings.

    The driver's canonicalizer is green on datetime64-vs-object splits
    (m3_scd2 valid_from/to, cohort_week, the ts_* day columns), so the
    local gate must not red them; it must only red splits that change
    the stringified value itself.

    Known approximation (review finding, r10): a NULL datetime maps to
    the sentinel "NaT" on BOTH sides, so a NaT-vs-None dtype divergence
    would compare equal here. Registry audit (r10): exactly one oracle
    emits a nullable datetime (`j6_asof_join.r_ts`) and BOTH sides
    materialize it as datetime64/NaT — identical strings under any
    model — so the driver's rendering of a None-vs-NaT split is
    unobserved. If a future query emits an OBJECT-dtype nullable
    datetime on one side only, verify the driver's behavior before
    trusting local green — or COALESCE the SQL side to a sentinel date
    so the question never arises.
    """
    if _is_datelike(a) or _is_datelike(b):
        return a.map(_iso).astype(str), b.map(_iso).astype(str), True
    return a, b, False


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
            av, bv, datelike = normalize_datetimes(av, bv)
            # int-vs-float dtype divergence fails loudly in EVERY mode:
            # the string forms differ ("14997" vs "14997.0") so the
            # driver hash MUST red it even when values are numerically
            # equal — the exact defect that hid for two rounds.
            ak, bk = av.dtype.kind, bv.dtype.kind
            if {ak, bk} & set("iu") and "f" in {ak, bk}:
                return f"DTYPE col={c}: {av.dtype} vs {bv.dtype} (int-vs-float strings differ)"
            if exact or datelike:
                sa, sb = av.astype(str), bv.astype(str)
                if not sa.equals(sb):
                    i = (sa != sb).idxmax()
                    return f"VALUES col={c} row{i}: {av[i]!r} vs {bv[i]!r}"
            elif pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                import numpy as np

                if not np.allclose(
                    av.astype(float).fillna(-1e308), bv.astype(float).fillna(-1e308), rtol=0, atol=1e-9
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
