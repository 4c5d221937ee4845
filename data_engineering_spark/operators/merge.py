"""Keyed mutation operators: MERGE (upsert), CDC apply, SCD2 history.

The reference mutates warehouse tables with delete-then-append
(``AWS_GLUE_ETL.py:124-132`` preactions delete, ``BkupRs.py:272-280``
per-date delete + append) — which only works when the "key" is a whole
partition. These operators are the row-keyed generalization, expressed
as joins so Catalyst plans them distributed:

- ``merge_upsert`` — SQL MERGE semantics (update matched, insert
  unmatched) via a single full-outer join on the key.
- ``apply_cdc`` — collapse a Debezium-shaped change feed (op ∈
  I/U/D + sequence column) to the latest op per key, then merge it:
  the batch form of Structured Streaming's foreachBatch CDC sink.
- ``scd2_apply`` — slowly-changing-dimension type 2: close changed
  rows, insert new versions, keep history queryable by validity range.

Scale: each is one key-partitioned shuffle (the join); at warehouse
scale the target should be bucketed on the key (sources/writers.py:
bucketize) so only the (usually tiny) change set moves. Rewriting the
whole target per batch is what the transaction log's file-replace
commits (sources/txlog.py) amortize on real storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_upsert", "apply_cdc", "scd2_apply"]


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    validate_source_keys: bool = True,
) -> DataFrame:
    """MERGE: rows matched on ``keys`` take ALL non-key columns from
    ``source``; unmatched target rows pass through; unmatched source
    rows are inserted. Column sets must match (the SQL MERGE contract
    for UPDATE SET * / INSERT *).

    SQL MERGE requires a UNIQUE source key — a duplicate would silently
    fan out every matched target row. ``validate_source_keys`` embeds a
    ``raise_error`` guard in the plan (a window count over the same key
    partitioning the join shuffles on anyway — no extra job, no
    collect), so a non-unique source fails loudly with the offending
    key instead of multiplying rows. Pre-collapse intentional multi-row
    feeds first (``apply_cdc`` latest-wins does exactly that)."""
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"column mismatch: target {sorted(target.columns)} "
            f"vs source {sorted(source.columns)}"
        )
    payload = [c for c in target.columns if c not in keys]
    # presence flag survives all-null source payloads; when validating,
    # the flag itself carries the duplicate-key guard — keys stay
    # untouched attributes, so the guard window's hash partitioning on
    # the keys is REUSED by the merge join (no extra Exchange; asserted
    # by the m1 shuffle budget)
    present: F.Column = F.lit(True)
    if validate_source_keys:
        from pyspark.sql import Window

        n_src = F.count(F.lit(1)).over(Window.partitionBy(*keys))
        # A row with any null key can never match a target row (the join
        # equality is null-unsafe), so each one legally inserts — but the
        # window groups null keys together, which would trip the guard.
        # Exempt them: only all-non-null keys can fan out.
        keys_joinable = F.lit(True)
        for k in keys:
            keys_joinable = keys_joinable & F.col(k).isNotNull()
        present = F.when(
            keys_joinable & (n_src > 1),
            F.raise_error(
                F.concat(
                    F.lit("merge_upsert: multiple source rows for key ("),
                    F.concat_ws(", ", *[F.col(k).cast("string") for k in keys]),
                    F.lit(
                        ") — MERGE needs a unique source key; "
                        "collapse the feed first (see apply_cdc)"
                    ),
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    s = source.withColumn("__present__", present).alias("s")
    joined = target.alias("t").join(s, on=keys, how="full_outer")
    # key columns are coalesced by the USING join; payload picks source
    # whenever the source row exists (update and insert in one pass;
    # null __present__ → unmatched target row → otherwise branch)
    out = joined.select(
        *keys,
        *[
            F.when(F.col("s.__present__"), F.col(f"s.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in payload
        ],
    )
    return out.select(*target.columns)


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply a change feed: per key, only the LATEST change wins —
    ordered by ``seq_col`` descending, ties broken by ``op_col``
    descending for determinism. 'D' deletes the key, 'I'/'U' upsert the
    row. The feed's payload columns must match the target's.

    This is the batch twin of a streaming CDC sink: run it per
    micro-batch over foreachBatch with the same semantics."""
    from pyspark.sql import Window

    payload = [c for c in target.columns if c not in keys]
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc(), F.col(op_col).desc())
    latest = (
        changes.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )
    upserts = latest.filter(F.col(op_col) != "D").select(*keys, *payload)
    deletes = latest.filter(F.col(op_col) == "D").select(*keys)
    survived = target.join(deletes, on=keys, how="left_anti")
    return merge_upsert(survived, upserts, keys)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    batch_date: str,
    open_end: str = "9999-12-31",
) -> DataFrame:
    """SCD type 2: ``dim`` carries (key, attributes, valid_from,
    valid_to, is_current). For each update row whose tracked attributes
    differ from the key's CURRENT dim row, the current row closes
    (valid_to = batch_date, is_current = false) and a new current row
    opens (valid_from = batch_date). Unchanged keys and historical rows
    pass through untouched; brand-new keys insert as current.

    One shuffle on the key; history rows never join (filtered by
    is_current before the comparison)."""
    attrs = [c for c in updates.columns if c != key]
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))
    diff = None
    for c in tracked:
        ne = ~(F.col(f"u.{c}").eqNullSafe(F.col(f"c.{c}")))
        diff = ne if diff is None else (diff | ne)

    j = updates.alias("u").join(cur.alias("c"), on=key, how="left")
    changed = j.filter(F.col(f"c.valid_from").isNotNull() & diff).select(
        key, *[F.col(f"u.{c}").alias(c) for c in attrs]
    )
    brand_new = j.filter(F.col(f"c.valid_from").isNull()).select(
        key, *[F.col(f"u.{c}").alias(c) for c in attrs]
    )
    changed_keys = changed.select(key)
    closed = (
        cur.join(changed_keys, on=key, how="left_semi")
        .withColumn("valid_to", F.lit(batch_date).cast("date"))
        .withColumn("is_current", F.lit(False))
    )
    untouched_cur = cur.join(changed_keys, on=key, how="left_anti")
    opened = (
        changed.unionByName(brand_new)
        .withColumn("valid_from", F.lit(batch_date).cast("date"))
        .withColumn("valid_to", F.lit(open_end).cast("date"))
        .withColumn("is_current", F.lit(True))
    )
    cols = dim.columns
    return (
        hist.select(cols)
        .unionByName(closed.select(cols))
        .unionByName(untouched_cur.select(cols))
        .unionByName(opened.select(cols))
    )
