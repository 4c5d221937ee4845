"""Mergeable-sketch operators — the pre-aggregation pattern for
distinct counts and frequencies at 100 TB.

The at-scale problem: "distinct users per <any dimension slice / any
date range>" cannot be answered by rescanning raw events per question —
COUNT(DISTINCT) does not decompose over pre-aggregated partials. A
MERGEABLE sketch does: build a sketch table once (one pass over the raw
data, keyed by the finest grain you'll ever query, e.g. day × dimension),
persist the sketch binaries as an ordinary parquet column, and answer
every later rollup by merging only the relevant cells' sketches —
seconds over kilobytes instead of a 100 TB rescan. This is the standard
warehouse "sketch table" / "HLL column" design (Apache DataSketches;
BigQuery HLL_COUNT, Snowflake HLL_COMBINE are the same shape).

Spark-first: both sketch families here are NATIVE JVM aggregates with
map-side partial merge — no UDFs, no shuffle beyond the one the groupBy
already pays, and the merge is register-wise/cell-wise so the result is
partition- and order-invariant (asserted in tests):

- **HLL** (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`,
  Spark's Apache DataSketches binding): distinct-count sketches,
  relative standard error ≈ 1.04/√2^lgk (~1.6 % at lgk=12, 2 KB
  registers dense). Union = per-register max ⇒ re-aggregating daily
  sketches to weeks/months/all-time is exact sketch algebra, not an
  approximation stacked on an approximation.
- **Count-min** (`count_min_sketch`, Spark's `util.sketch`): frequency
  estimates with one-sided error — estimates NEVER undercount, and
  overcount at most ε·N with probability ≥ confidence. Cell-wise sums
  merge; the serialized sketch is a few hundred KB at ε=0.001.

Reference scope note: the reference engine has no sketch layer (its
nearest analog is full-scan COUNT DISTINCT in its SQL dialect); this
module is part of the beyond-reference training-data-pipeline surface,
next to the KMV overlap estimator (queries_llm.py:q_corpus_overlap_kmv)
which solves the two-corpus Jaccard variant of the same problem.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_rollup",
    "hll_rollup_estimate",
    "hll_rollup_upsert",
    "cms_frequency_bounds",
    "hist_rollup",
    "hist_quantiles",
]


def hll_rollup(
    df: DataFrame,
    keys: list[Column | str],
    sketch_cols: dict[str, str],
    lgk: int = 12,
) -> DataFrame:
    """Build the sketch table: one HLL binary per (key-tuple, column).

    ``keys`` is the finest grain the table will ever be asked about
    (e.g. ``[event_type, to_date(ts)]``); ``sketch_cols`` maps output
    sketch-column names to the input columns whose distinct counts they
    capture. Also carries ``n_rows`` so exact row counts roll up beside
    the sketches. The output is an ordinary DataFrame — write it to
    parquet and the sketch column persists as ``binary``; a later reader
    merges it with ``hll_union_agg`` without touching raw data.

    Scale shape: ONE groupBy on the rollup keys with map-side partial
    aggregation (ObjectHashAggregate over the sketch buffers); shuffle
    carries (keys, one ~2 KB register block per sketch column) — bounded
    by the cell count, never the row count."""
    aggs = [
        F.hll_sketch_agg(src, F.lit(lgk)).alias(out)
        for out, src in sketch_cols.items()
    ]
    aggs.append(F.count(F.lit(1)).cast("long").alias("n_rows"))
    return df.groupBy(*keys).agg(*aggs)


def hll_rollup_estimate(
    sketch_df: DataFrame,
    group_keys: list[Column | str],
    sketch_cols: list[str],
) -> DataFrame:
    """Answer a rollup FROM the sketch table: merge each cell's sketches
    up to ``group_keys`` and estimate. ``<col>_est`` is the distinct
    estimate (BIGINT — DataSketches rounds once, deterministically),
    ``n_cells`` the number of merged cells, ``n_rows`` the exact row
    rollup. Union is register-wise max, so any partitioning of the cells
    yields byte-identical merged registers (partition-invariance is
    pytest-asserted)."""
    aggs = [
        F.hll_sketch_estimate(F.hll_union_agg(c)).cast("long").alias(f"{c}_est")
        for c in sketch_cols
    ]
    aggs.append(F.count(F.lit(1)).cast("long").alias("n_cells"))
    aggs.append(F.sum("n_rows").cast("long").alias("n_rows"))
    return sketch_df.groupBy(*group_keys).agg(*aggs)


def hll_rollup_upsert(
    existing: DataFrame,
    new_rows: DataFrame,
    keys: list[str],
    sketch_cols: dict[str, str],
    lgk: int = 12,
) -> DataFrame:
    """Incrementally maintain a sketch table from an append batch: sketch
    the NEW raw rows at the same grain, then cell-wise HLL-union them
    into the existing table — the daily-ingest loop that keeps a sketch
    table current without ever rescanning history (union = register max,
    so upserting a batch is EXACTLY equal to rebuilding from all raw
    rows — pytest-asserted, not approximately-equal).

    APPEND-ONLY by construction: HLL registers cannot forget, so
    deletes/updates to history require rebuilding the affected cells
    from raw data (the same contract every production HLL column has;
    route deletions through a cell-level rebuild keyed by the CDF's
    changed-file pruning if the raw table is a logged lake table).

    ``keys`` must name plain columns here (the grain is already
    materialized in the existing table); ``n_rows`` adds exactly.
    Scale shape: sketching the batch costs one batch-sized groupBy;
    the merge shuffles only the CELLS of the union of key sets."""
    batch = hll_rollup(new_rows, [F.col(k) for k in keys], sketch_cols, lgk)
    both = existing.select(*keys, *sketch_cols, "n_rows").unionByName(
        batch.select(*keys, *sketch_cols, "n_rows")
    )
    aggs = [F.hll_union_agg(c).alias(c) for c in sketch_cols]
    aggs.append(F.sum("n_rows").cast("long").alias("n_rows"))
    return both.groupBy(*keys).agg(*aggs)


def hist_rollup(
    df: DataFrame,
    keys: list[Column | str],
    value_col: Column | str,
    bin_width: int,
) -> DataFrame:
    """Mergeable HISTOGRAM sketch table: per (key-tuple, bin) exact
    counts of an integer measure binned at ``bin_width`` — the third
    sketch family, and the one with the STRONGEST oracle story: unlike
    HLL/CMS the state is plain integers, so build, merge, and every
    quantile read are bit-reproducible in any engine (hash-exact, no
    probabilistic bounds needed). Error is a deterministic resolution
    bound — a quantile from the merged histogram is exact to its bin's
    lower edge (≤ bin_width below the true order statistic), which is
    the dashboard-grade contract pre-binned percentile stores run on.

    ``value_col`` must be integer-valued (cents, micros, bytes — the
    repo's standard exact-measure discipline); the bin index is
    ``floor(v / bin_width)`` via one IEEE double division + floor,
    identical in Spark and DuckDB for |v| < 2^52 (handles negatives,
    unlike truncating integer div which rounds toward zero).

    Merge algebra: bin counts ADD — re-aggregating daily cells to any
    range is exact, and unlike HLL the histogram also SUBTRACTS, so
    CDF-driven maintenance can apply deletes as negative deltas.
    Scale shape: one groupBy whose cell count is bounded by
    |keys-domain| × (value range / bin_width), never the row count."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    bin_idx = F.floor(v.cast("double") / F.lit(float(bin_width))).cast("long")
    return df.groupBy(*keys, bin_idx.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def hist_quantiles(
    hist_df: DataFrame,
    group_keys: list[str],
    bin_width: int,
    qs: list[int],
) -> DataFrame:
    """Answer quantiles FROM the histogram table: merge cells up to
    ``group_keys`` (bin counts add), cumulative-sum over ascending bins,
    and for each q in ``qs`` (percent, integers — the grid keeps every
    comparison integer-exact) emit the LOWER EDGE of the first bin whose
    cumulative count reaches ⌈q% · n⌉ — the standard histogram-quantile
    estimator, deterministic by construction: ``cum · 100 ≥ n · q`` is
    a pure int64 comparison, never a float threshold. Columns:
    ``p<q>_lo`` per q, plus exact ``n``. One cell-sized shuffle + one
    window over the merged bins; rows never re-scan."""
    merged = hist_df.groupBy(*group_keys, "bin").agg(F.sum("cnt").alias("cnt"))
    from pyspark.sql import Window

    wk = Window.partitionBy(*group_keys)
    w = wk.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    c = merged.select(
        *group_keys,
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wk).alias("total"),
    )
    aggs = [F.min("total").cast("long").alias("n")]
    for q in qs:
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") * 100 >= F.col("total") * F.lit(int(q)),
                    F.col("bin") * F.lit(int(bin_width)),
                )
            )
            .cast("long")
            .alias(f"p{q}_lo")
        )
    return c.groupBy(*group_keys).agg(*aggs)


def cms_frequency_bounds(
    df: DataFrame,
    col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Count-min frequency estimates for every distinct value of ``col``,
    emitted WITH their proof obligations: ``(value, exact_n, cms_est,
    cms_lower_ok, cms_upper_ok)`` where ``cms_lower_ok`` asserts the
    one-sided guarantee est ≥ exact (structural — CMS cells only ever
    overcount) and ``cms_upper_ok`` the ε-bound est ≤ exact + ε·N.

    Deterministic: the sketch's hash family derives from ``seed`` and
    cell merges are commutative sums, so the estimates are a pure
    function of the multiset — independent of partitioning (tested).

    Driver contract: the sketch itself aggregates DISTRIBUTED (native
    ``count_min_sketch`` with map-side partial merge; one serialized
    sketch — ~112 KB at ε=0.001 — reaches the driver), and the exact
    counts are one groupBy whose result is BOUNDED BY THE VALUE DOMAIN,
    not the row count — this operator is for enum-like columns (event
    types, status codes, language tags). Estimation per value is a
    driver-side lookup against the deserialized sketch via Spark's
    public ``org.apache.spark.util.sketch.CountMinSketch`` Java API
    (there is no SQL-level estimator function to keep it distributed).
    NULLs are excluded: the native aggregate skips them, so a NULL key
    would probe a sketch that never counted it.

    Key types: string or integral (the two families both the native
    aggregate and ``estimateCount`` hash consistently — integrals widen
    to long on BOTH the build and probe side). Anything else raises
    up front rather than probing with a mismatched hash."""
    from pyspark.sql import types as T

    spark = df.sparkSession
    key_type = df.schema[col].dataType
    if not isinstance(
        key_type, (T.StringType, T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise ValueError(
            f"cms_frequency_bounds: unsupported key type {key_type.simpleString()} "
            f"for column {col!r} — count-min supports string/integral keys"
        )
    src = df.filter(F.col(col).isNotNull())
    row = src.agg(
        F.count_min_sketch(
            col, F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms")
    ).collect()[0]
    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(row["cms"]))
    )
    total = int(cms.totalCount())
    # bounded by |domain(col)| — the enum-column contract above
    exact = (
        src.groupBy(col)
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .collect()
    )
    # ceil-ing the ε bound keeps the check integer-exact (ε·N is a tiny
    # float product of two exact values; the +1 slack of ceil never
    # admits a genuinely-violating estimate because violations are
    # whole-count collisions, not fractions)
    import math

    slack = math.ceil(eps * total)
    out_rows = []
    for r in exact:
        est = int(cms.estimateCount(r[col]))
        out_rows.append(
            (
                r[col],
                int(r["exact_n"]),
                est,
                est >= int(r["exact_n"]),
                est <= int(r["exact_n"]) + slack,
            )
        )
    # the key column keeps ITS OWN type (an int enum used to crash the
    # hardcoded-string schema here — end-of-round review)
    out_schema = T.StructType(
        [
            T.StructField(col, key_type),
            T.StructField("exact_n", T.LongType()),
            T.StructField("cms_est", T.LongType()),
            T.StructField("cms_lower_ok", T.BooleanType()),
            T.StructField("cms_upper_ok", T.BooleanType()),
        ]
    )
    return spark.createDataFrame(out_rows, schema=out_schema)
