"""Time-series operators beyond plain windows: shape-preserving
downsampling (LTTB). The gap-fill / TWA / anomaly rollups live as
registered queries (queries_extra.py / queries_relational.py); this
module holds the per-series imperative kernels that need
``applyInPandas``.

Scale design: every operator here is keyed by a series id — the natural
partition key — so Spark distributes one series-group per task and the
Python kernel only ever sees one bounded pandas frame. Nothing touches
the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["lttb", "lttb_downsample", "lttb_fixed", "lttb_downsample_portable"]


def lttb(x: np.ndarray, y: np.ndarray, k: int) -> np.ndarray:
    """Largest-Triangle-Three-Buckets: pick ``k`` indices from a series
    (sorted by x) that preserve its visual shape — the standard
    dashboard downsampler. First/last points always kept; each interior
    bucket keeps the point forming the largest triangle with the
    previously selected point and the NEXT bucket's centroid.
    Deterministic: ties resolve to the lowest index (argmax)."""
    n = len(x)
    if k >= n or k < 3:
        return np.arange(n)
    idx = np.empty(k, dtype=np.int64)
    idx[0], idx[-1] = 0, n - 1
    # bucket boundaries over the interior points [1, n-1)
    bounds = (np.arange(k - 1) * (n - 2)) // (k - 2) + 1
    bounds = np.concatenate([bounds, [n - 1]])
    prev = 0
    for b in range(k - 2):
        lo, hi = bounds[b], bounds[b + 1]
        if b < k - 3:
            nlo, nhi = bounds[b + 1], bounds[b + 2]
        else:
            # last interior bucket: the next anchor is the final point —
            # bounds[b+2] here is n-1, which would make the slice empty
            # (NaN centroid) and silently pick the bucket's first point
            nlo, nhi = n - 1, n
        cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
        ax, ay = x[prev], y[prev]
        # triangle area ∝ |(ax-cx)*(y-ay) - (ax-x)*(cy-ay)|
        area = np.abs((ax - cx) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (cy - ay))
        prev = lo + int(np.argmax(area))
        idx[b + 1] = prev
    return idx


def lttb_downsample(
    df: DataFrame,
    k: int = 50,
    series_col: str = "event_type",
    x_col: str = "ts",
    y_col: str = "value",
) -> DataFrame:
    """Downsample each series to ``k`` shape-preserving points via LTTB
    inside ``applyInPandas`` — one task per series, kernel-local numpy,
    no driver involvement. Output keeps the original (series, x, y)
    columns plus the selected point's 0-based position in its series.

    At 100 TB the series key is the shuffle key: a single groupBy
    exchange co-locates each series, and the output is k rows per series
    regardless of input size — the canonical reduce-before-collect for
    dashboards over raw event streams (series shorter than k pass
    through whole; k < 3 raises — LTTB needs first + last + one
    bucket, and the kernel's k<3 escape hatch would otherwise emit the
    ENTIRE series, inverting the reduce contract; r11 review)."""
    if k < 3:
        raise ValueError(f"lttb_downsample: k must be >= 3, got {k}")
    out_schema = T.StructType(
        [
            T.StructField("series", T.StringType()),
            T.StructField("x_epoch", T.DoubleType()),
            T.StructField("y", T.DoubleType()),
            T.StructField("pos", T.LongType()),
        ]
    )

    def downsample(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([x_col, y_col], kind="mergesort").reset_index(drop=True)
        # unit-independent epoch seconds via datetime64[us] — a bare
        # astype('int64') reads ns OR µs depending on which datetime64
        # unit the Arrow conversion hands the kernel (the 1000× shift
        # the portable twin below always normalized against; r11 review
        # aligned this kernel with it)
        xi = pd.DatetimeIndex(pdf[x_col])
        if xi.tz is not None:
            xi = xi.tz_localize(None)
        x = xi.to_numpy(dtype="datetime64[us]").astype("int64") / 1e6
        y = pdf[y_col].astype("float64").to_numpy()
        keep = lttb(x, y, k)
        return pd.DataFrame(
            {
                "series": pdf[series_col].iloc[keep],
                "x_epoch": x[keep],
                "y": y[keep],
                "pos": keep,
            }
        )

    return (
        df.select(series_col, x_col, y_col)
        .groupBy(series_col)
        .applyInPandas(downsample, schema=out_schema)
    )


def lttb_fixed(x: list, y: list, k: int) -> list:
    """LTTB selection over INTEGER coordinates with exact (arbitrary-
    precision) arithmetic — the engine-portable twin of :func:`lttb`.

    Same greedy algorithm, but the bucket centroid is never divided out:
    with centroid (sx/cnt, sy/cnt), the triangle area comparison is
    multiplied through by cnt, so every candidate's figure of merit

        |(ax·cnt − sx)·(y − ay) − (ax − x)·(sy − ay·cnt)|

    is a plain integer — no float summation order, no rounding, no
    argmax tie decided by the last bit of a pairwise-summed mean. That
    makes the selection reproducible by any engine with exact integer
    arithmetic (DuckDB runs the identical recursion in HUGEINT), which
    is what turns the 'greedy sequential selection' into an
    oracle-checkable query. Products reach ~1e24 (µs·count·fixed-point
    span), so the kernel runs on Python ints, not numpy int64."""
    n = len(x)
    if k >= n or k < 3:
        return list(range(n))
    bounds = [(b * (n - 2)) // (k - 2) + 1 for b in range(k - 1)] + [n - 1]
    keep = [0]
    prev = 0
    for b in range(k - 2):
        lo, hi = bounds[b], bounds[b + 1]
        nlo, nhi = (bounds[b + 1], bounds[b + 2]) if b < k - 3 else (n - 1, n)
        cnt = nhi - nlo
        sx, sy = sum(x[nlo:nhi]), sum(y[nlo:nhi])
        ax, ay = x[prev], y[prev]
        best = None
        for p in range(lo, hi):
            area2 = abs((ax * cnt - sx) * (y[p] - ay) - (ax - x[p]) * (sy - ay * cnt))
            if best is None or area2 > best[0]:
                best = (area2, p)
        prev = best[1]
        keep.append(prev)
    keep.append(n - 1)
    return keep


def lttb_downsample_portable(
    df: DataFrame,
    k: int = 50,
    series_col: str = "event_type",
    x_col: str = "ts",
    y_col: str = "value",
) -> DataFrame:
    """Exact-arithmetic LTTB downsampling — the oracle-verification twin
    of :func:`lttb_downsample`. Identical distribution shape (one
    groupBy exchange, kernel-local selection, k rows out per series) but
    the kernel quantizes to integers first — x as epoch MICROSECONDS, y
    as round-half-up 1e-6 fixed point — and selects via
    :func:`lttb_fixed`, so a DuckDB recursive CTE re-derives the full
    greedy recursion bit-for-bit (same quantization: ``epoch_us(ts)``,
    ``floor(value*1e6 + 0.5)``). Output carries the selected point's
    original double ``y`` untouched plus exact-integer ``x_us``, so the
    driver's value hash has no float-derived column at all. The
    quantization can in principle pick a different point than the
    float kernel where two triangle areas differ only in the sub-1e-6
    tail — which is exactly the tie the float path resolves by
    summation-order luck; the fixed-point rule is the deterministic one.
    Python-int loop ≈ O(points) per series: the verification-variant
    cost, paid only here (production keeps the numpy kernel)."""
    if k < 3:
        raise ValueError(f"lttb_downsample_portable: k must be >= 3, got {k}")
    out_schema = T.StructType(
        [
            T.StructField("series", T.StringType()),
            T.StructField("pos", T.LongType()),
            T.StructField("x_us", T.LongType()),
            T.StructField("y", T.DoubleType()),
        ]
    )

    def downsample(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([x_col, y_col], kind="mergesort").reset_index(drop=True)
        # unit-independent epoch-µs: a bare astype("int64") would read ns
        # OR µs depending on which datetime64 unit the Arrow conversion
        # hands the kernel, silently shifting x by 1000×; normalizing
        # through datetime64[us] is exact for micros-precision inputs
        # under either unit (tz-aware input is wall-clock = UTC here,
        # the session tz prepare_session pins)
        xi = pd.DatetimeIndex(pdf[x_col])
        if xi.tz is not None:
            xi = xi.tz_localize(None)
        x = xi.to_numpy(dtype="datetime64[us]").astype("int64").tolist()
        yv = pdf[y_col].to_numpy(dtype="float64")
        yf = np.floor(yv * 1e6 + 0.5).astype("int64").tolist()
        keep = lttb_fixed(x, yf, k)
        return pd.DataFrame(
            {
                "series": pdf[series_col].iloc[keep],
                "pos": np.asarray(keep, dtype="int64"),
                "x_us": [x[p] for p in keep],
                "y": yv[keep],
            }
        )

    return (
        df.select(series_col, x_col, y_col)
        .groupBy(series_col)
        .applyInPandas(downsample, schema=out_schema)
    )
