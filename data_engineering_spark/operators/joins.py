"""Join operators (SURVEY §2.3, J1-J5 + the [absent] extras).

Scale stance: dimension sides that fit in memory are explicitly
``broadcast()`` (the reference relies on Redshift/Catalyst to figure this
out; we make it deliberate). Fact-fact joins shuffle on their keys and rely
on AQE skew-join splitting (enabled in ``session.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "input_bytes",
    "broadcast_if_small",
    "left_join_chain",
    "semi_join",
    "anti_join",
    "broadcast_lookup_join",
    "asof_join",
    "range_join",
    "salted_join",
    "fuzzy_join",
]


def input_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of the DataFrame's input files, or None when
    unknowable from the driver (no file source, or a non-local scheme
    where stat-ing every file isn't free). Pure driver-side fs metadata —
    no Spark job, no RDD conversion. The gate behind every size-
    conditional hint in the repo: a FORCED broadcast/shuffle hint must
    never apply to a relation that grows with the corpus (the 300×
    probe caught the flagship force-broadcasting a 4.5 M-row customer
    dim — 2× super-linear from driver-side broadcast build alone)."""
    import os
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — e.g. streaming frames
        return None
    if not files:
        return None
    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("", "file"):
            return None
        try:
            total += os.path.getsize(unquote(u.path))
        except OSError:
            return None
    return total


# The single gate every size-conditional broadcast hint shares: 16 MB of
# parquet, sized for the ~10× parquet→in-memory-row blowup against the
# session's 64 MB plan threshold. Retune HERE only.
BROADCAST_GATE_BYTES = 16 << 20


def broadcast_if_small(df: DataFrame, limit: int = BROADCAST_GATE_BYTES) -> DataFrame:
    """``F.broadcast(df)`` only when the relation's input files total
    ≤ ``limit`` bytes (16 MB of parquet by default — sized for the ~10×
    parquet→in-memory-row blowup against the session's 64 MB plan
    threshold); otherwise the frame is returned unhinted and AQE picks
    the join from runtime sizes.

    Use for every forced broadcast whose side SCALES WITH THE CORPUS
    (filtered customer/supplier/part dims, per-key aggregates): at
    bench/oracle SFs the hint applies and the plan is the asserted
    broadcast shape; at warehouse scale forcing it measured 2× slower
    than AQE's choice on the flagship (SCALE §6b-r7 300× probe).
    Fixed-size relations (nation/region, 1-row scalar aggregates,
    calendar spines) keep plain ``F.broadcast`` — they never grow.
    ``inputFiles`` on a derived frame resolves to its source scans, so
    the gate is a conservative upper bound for aggregates (a per-part
    average gates on lineitem's bytes — at the SFs where that matters
    the aggregate is genuinely too big to force anyway).

    Unknowable size (``input_bytes`` → None: non-local scheme, no file
    source) deliberately means NO hint — forcing a broadcast whose size
    cannot be bounded is exactly the trap this helper exists to close;
    AQE still broadcasts genuinely-small sides from runtime stats
    (unless the user disables it with threshold = -1, in which case
    un-hinted shuffles are the conservative outcome we want)."""
    nbytes = input_bytes(df)
    return F.broadcast(df) if (nbytes is not None and nbytes <= limit) else df


def left_join_chain(fact: DataFrame, dims: Sequence[tuple[DataFrame, Column | str, bool]]) -> DataFrame:
    """J1 — fact LEFT OUTER JOIN dim₁ … dimₙ (reference
    ``Talent_Opportunity_Platform/Elastic_indexing.py:131-158``: t3_emp_feature
    left-joined to 3 derived tables on emp_no).

    ``dims``: (dim_df, join_condition_or_key, broadcast?) triples. Small
    derived dims are broadcast so the fact never shuffles for them.
    """
    out = fact
    for dim, on, do_broadcast in dims:
        d = F.broadcast(dim) if do_broadcast else dim
        out = out.join(d, on=on, how="left")
    return out


def semi_join(left: DataFrame, right: DataFrame, on: Column | str) -> DataFrame:
    """J3 — membership-only inner join upgraded to ``left_semi``
    (reference ``Keyword.py:175-181`` joins ``emp_pre`` purely for
    filtering; semi-join avoids materializing the right side's columns and
    lets Spark build a broadcast hash set)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Column | str) -> DataFrame:
    """[absent in reference] NOT EXISTS — ``left_anti`` built-in."""
    return left.join(right, on=on, how="left_anti")


def broadcast_lookup_join(
    hits: DataFrame, lookup: DataFrame, on: Column | str, how: str = "left"
) -> DataFrame:
    """J4 — the client-side nested-loop lookup (reference
    ``Openapi/openai_elasticsearch.py:224-292``: per top hit, fetch the
    matching doc from a second index by emp_no and merge fields) as a
    broadcast hash join: one pass, no driver loop, no per-row RPC."""
    return hits.join(F.broadcast(lookup), on=on, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """[absent in reference] as-of join: for each left row, the latest
    right row with ``right_ts <= left_ts`` (backward) or earliest with
    ``>=`` (forward), per key. Left-outer semantics: unmatched left rows
    keep null payloads.

    Implementation: the merge-asof — union both sides tagged, one shuffle
    on ``key``, sort by event time within key, carry the last (first)
    non-null right payload forward (backward) with a running window.
    Strictly O((L+R) log) per key: a pair-then-rank formulation would
    materialize every (left, earlier-right) combination — per-key
    quadratic on dense right sides — while this shape never forms pairs
    at all. The single hash partition by ``key`` is the only exchange.

    NULL semantics (r11 review — three silent deviations from SQL ASOF
    closed): a right row with a NULL key or NULL timestamp can never
    match (``right_ts <= left_ts`` is never true for NULL — the old
    NULLS-FIRST sort placed such rows at the partition start where the
    running ``last(ignorenulls)`` carried their payload into every left
    row); a left row with a NULL key or timestamp emits NULL payloads
    (left-outer). Ties on (key, right_ts) between DISTINCT right rows
    break deterministically on the payload struct itself (greatest wins
    backward, least forward — lexicographic by field) when every right
    payload type is orderable; with a non-orderable payload (maps) the
    tie pick remains engine-/run-dependent, as in every merge-asof."""
    from pyspark.sql import Window
    from pyspark.sql import types as T

    rpayload = [c for c in right.columns if c != key]
    l = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    # The whole payload travels as ONE struct so every carried field comes
    # from the SAME matched right row — carrying columns independently
    # with last(ignorenulls) would backfill a NULL field from an older
    # row, emitting a combined row that never existed.
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in rpayload]).alias("__rpay"),
    ).filter(F.col(key).isNotNull() & F.col("__ts").isNotNull())

    def _orderable(dt: T.DataType) -> bool:
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    tiebreak = (
        [F.col("__rpay").asc()]
        if all(_orderable(f.dataType) for f in right.schema.fields if f.name != key)
        else []
    )
    u = l.unionByName(r, allowMissingColumns=True)
    if direction == "backward":
        # right rows order BEFORE left rows at equal ts (<= matches)
        w = (
            Window.partitionBy(key)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc(), *tiebreak)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("__rpay", ignorenulls=True).over(w)
    else:
        # right rows order AFTER left rows at equal ts (>= matches)
        w = (
            Window.partitionBy(key)
            .orderBy(F.col("__ts").asc(), F.col("__side").desc(), *tiebreak)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = F.first("__rpay", ignorenulls=True).over(w)
    # a left row with NULL key/ts never matches (its window frame could
    # otherwise see every right row after the NULLS-FIRST sort)
    carried = F.when(
        F.col("__ts").isNotNull() & F.col(key).isNotNull(), carried
    )
    return (
        u.select(*left.columns, "__side", carried.alias("__rpay"))
        .filter(F.col("__side") == 1)
        .select(
            *left.columns,
            *[F.col(f"__rpay.{c}").alias(f"r_{c}") for c in rpayload],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    how: str = "inner",
    broadcast_right: bool = True,
) -> DataFrame:
    """[absent in reference] point-in-interval join. With a small interval
    table the broadcast turns O(n·m) into a broadcast-nested-loop that never
    shuffles the big side."""
    r = F.broadcast(right) if broadcast_right else right
    cond = (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) < F.col(right_hi))
    return left.join(r, cond, how)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on_large: str,
    on_small: str,
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Skew-buster join: replicate the small side ``salts``× and scatter
    the large side's hot keys across (key, salt) sub-partitions.

    AQE's skew-join splitting (on in session.py) handles most skew at
    runtime; this explicit variant is for the pathological case AQE can't
    fix — a single join key carrying a double-digit percent of the fact —
    or for engines/stages where AQE is off (e.g., inside streaming
    foreachBatch). The salt is a deterministic hash of the large row's
    full column tuple, so re-runs produce identical partitioning (no
    rand(): nondeterministic salts break task retries at scale).

    Cost model: small side grows ``salts``×, large side never duplicates —
    the right trade when |small| ≪ |large| and the skew is on the large
    side's key distribution.

    Only ``inner`` and ``left`` are supported: the small side is
    replicated ``salts``×, so right/full-outer (or anti) joins would emit
    each unmatched small-side row once per salt."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the replicated small side would duplicate unmatched rows "
            "under right/full/anti semantics"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salts)).cast("int")
    # alias-qualified key references (the fuzzy_join pattern), not bare
    # F.col and not df[col] indexing: bare references are
    # AMBIGUOUS_REFERENCE when on_large/on_small share a name (r11
    # review, reproduced), and df[col] still collides when the two
    # frames share LINEAGE (self-join on a derived frame — the case
    # fuzzy_join's docstring pins; r11 advice)
    l = large.withColumn("_salt", salt).alias("__sj_l")
    s = small.withColumn(
        "_salt_s", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    ).alias("__sj_r")
    out = l.join(
        s,
        (F.col(f"__sj_l.{on_large}") == F.col(f"__sj_r.{on_small}"))
        & (F.col("__sj_l._salt") == F.col("__sj_r._salt_s")),
        how,
    )
    return out.drop("_salt", "_salt_s")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
    how: str = "inner",
) -> DataFrame:
    """[absent in reference] entity-resolution join: match rows whose
    string keys are within ``max_dist`` edit operations (JVM-side
    ``levenshtein``, codegen'd — no UDF). The right side broadcasts, so
    the big side never shuffles; the cost is |left| × |right_broadcast|
    distance evaluations. That is the honest contract: use it for
    dirty-key lookup against a bounded dimension (the classic use), and
    for corpus-vs-corpus matching switch to blocked candidates first
    (dedup.py's LSH/shingle generators) exactly as the near-dup
    operators do.

    Key references are alias-qualified so BOTH ambiguity modes resolve:
    the canonical same-NAME call ('name' vs 'name', which bare F.col
    made AMBIGUOUS_REFERENCE — r11 review, reproduced) and the shared-
    LINEAGE call (right derived from the same source as left, where
    df[col] indexing also fails)."""
    l, r = left.alias("__fz_l"), right.alias("__fz_r")
    dist = F.levenshtein(
        F.col(f"__fz_l.{left_col}"), F.col(f"__fz_r.{right_col}")
    )
    return l.join(F.broadcast(r), dist <= max_dist, how).withColumn(
        "edit_dist", dist
    )
