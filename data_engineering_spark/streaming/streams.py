"""Structured Streaming layer (SURVEY §2.9, Phase 4).

The reference's streaming is Kafka client code (exactly-once producer
``Kafka/producer.py:3-7`` / ``transaction/producer.py:6-21``,
read_committed consumer ``Kafka/consumer.py:4-15``) plus a scheduled
daily-incremental batch pattern (``Talent_Opportunity_Platform/
Airflow_week.py:26-29,146-152``). Structured Streaming subsumes all of it:

- exactly-once produce (ST1/ST2) → checkpointed ``writeStream`` — Spark's
  epoch commit protocol replaces init/begin/commit/abort.
- read_committed consume (ST3) → ``kafka.isolation.level=read_committed``
  reader option; offsets live in the checkpoint, not the broker.
- 300k-doc bulk flush (ST5) → ``foreachBatch``.
- the daily watermark batch (ST6) → ``Trigger.AvailableNow`` incremental
  runs over a file source.

The ``events`` table doubles as the replayable stream (FIXTURES.md §4).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "events_stream",
    "tumbling_counts",
    "sliding_value_sum",
    "session_windows",
    "streaming_dedup",
    "stateful_running_totals",
    "run_available_now",
    "foreach_batch_parquet_sink",
    "interval_join",
    "lake_streaming_sink",
    "cdc_upsert_sink",
    "kafka_source_options",
    "kafka_sink_options",
    "apply_kafka_source",
    "apply_kafka_sink",
    "to_kafka_payload",
]

def _events_raw_schema(sf_dir: str) -> tuple[T.StructType, str]:
    """Probe the on-disk ``ts`` dtype (events.parquet has shipped as both
    timestamp[ns] and timestamp[us] across driver rounds) and return the
    matching readStream schema plus the projection that rebuilds a
    session-TZ micros TimestampType. File streams need an explicit schema,
    so the probe reads parquet footer metadata only — no data scan."""
    import pyarrow.parquet as pq

    ts_type = pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type
    # Mirror catalog.load_table's three-way dtype branch (nanos → long,
    # tz-naive micros → NTZ, tz-aware → TimestampType passthrough) so the
    # same dtype drift that broke the batch loader can't break streaming.
    if getattr(ts_type, "unit", None) == "ns":
        spark_ts, expr = T.LongType(), "timestamp_micros(ts div 1000)"
    elif getattr(ts_type, "tz", None) is not None:
        spark_ts, expr = T.TimestampType(), "ts"
    else:  # timestamp[us/ms] tz-naive → Spark reads TIMESTAMP_NTZ
        spark_ts, expr = T.TimestampNTZType(), "cast(ts as timestamp)"
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", spark_ts),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    return schema, expr


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8-shaped file stream over the events table (one file = one replay;
    in production this is the Kafka topic, same downstream code).

    The ``nanosAsLong`` legacy flag is session-scoped and the stream
    reads it lazily, so it must stay set for the stream's lifetime —
    but it is now set ONLY when the footer probe actually reports
    nanos (r12 streaming review: the unconditional set leaked into
    every OTHER parquet read of the session, silently turning any
    nanos timestamp column into a long even for micros-era testdata
    where the flag does nothing but lie in wait)."""
    schema, ts_expr = _events_raw_schema(sf_dir)
    if isinstance(schema["ts"].dataType, T.LongType):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")  # basePath must be a dir
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.expr(ts_expr))


def tumbling_counts(stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window counts with late-data watermark
    ([absent] in the reference — SURVEY §2.9 last row)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "cnt",
        )
    )


def sliding_value_sum(
    stream: DataFrame, window: str = "1 hour", slide: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Sliding window sum of ``value`` per event_type."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "total_value")
    )


def session_windows(stream: DataFrame, gap: str = "10 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-based), the idiomatic replacement for
    driver-side sessionization."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def streaming_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful exactly-once-per-key dedup within the watermark horizon —
    the streaming twin of exact_dedup (state expires with the watermark,
    bounding memory at scale)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def stateful_running_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (event count, value total) maintained across micro-batches —
    the reference's driver-side group-by-key accumulator
    (``Talent_Opportunity_Platform/Elastic_indexing.py:226-328``: scalars
    overwrite, totals accumulate in a dict keyed by employee) re-expressed
    as distributed incremental state. State lives in the state store
    (checkpointed, partitioned by key), not a driver dict — per-key size
    is two numbers, so state growth is O(distinct users), bounded and
    spillable."""
    import pandas as pd  # local: executors import lazily
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(key: tuple, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, sink_dir: str
) -> None:
    """ST6 — ``Trigger.AvailableNow``: process everything new since the
    last checkpoint, then stop — the reference's daily `param_date`
    incremental batch without manual watermark bookkeeping."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", sink_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def foreach_batch_parquet_sink(
    sink_dir: str, transform: Callable[[DataFrame], DataFrame] | None = None
) -> Callable[[DataFrame, int], None]:
    """ST5 — the 300k-doc bulk-flush pattern
    (``Elastic_indexing.py:220-223``) as a foreachBatch sink: each
    micro-batch is one atomic, idempotent-by-batch-id write. Swap the body
    for an ES/JDBC bulk call in production; the batching contract is
    identical."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df) if transform else batch_df
        # overwrite, not append: a failed micro-batch is retried with the
        # SAME batch_id, so the replay must replace the partial write —
        # append would double the rows and break exactly-once.
        out.write.mode("overwrite").parquet(f"{sink_dir}/batch_id={batch_id}")

    return sink


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    upper: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """ST — stream-stream inner join on a key + time-range predicate
    (``right_ts ∈ [left_ts, left_ts + upper)``). Both sides carry
    watermarks, and the range condition is what lets Spark expire join
    state: without it a stream-stream join buffers forever. Works
    identically on batch frames (withWatermark is a no-op there), which
    is how the registry query oracle-checks the join semantics while
    tests/test_streaming.py checks the incremental execution. Column
    names must be pre-disambiguated (no shared names across sides)."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] < l[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond).drop(r[key])


def lake_streaming_sink(table, app_id: str) -> Callable[[DataFrame, int], None]:
    """Exactly-once streaming append into a transaction-logged table
    (``sources/txlog.py:LakeTable``): each micro-batch commits with a
    ``txn(app_id, batch_id)`` marker, so a failed batch replayed with
    the same batch_id is a no-op instead of a duplicate — the
    foreachBatch idempotency contract done at the LOG level rather than
    by directory-per-batch (``foreach_batch_parquet_sink``). Readers see
    each batch atomically; concurrent appends from other writers
    interleave safely."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        table.append(batch_df, txn=(app_id, batch_id))

    return sink


def cdc_upsert_sink(
    table, keys: list[str], app_id: str, op_col: str = "op", seq_col: str = "seq"
) -> Callable[[DataFrame, int], None]:
    """Streaming CDC → keyed table: each micro-batch of a Debezium-shaped
    change feed is collapsed and merged (``operators/merge.py:apply_cdc``)
    into the current table state, then committed as one idempotent
    overwrite commit (replays skip via the txn marker). The batch twin of
    a MERGE-writing structured stream; at warehouse scale the overwrite
    becomes file-level replacement of only the touched key ranges.

    The read-modify-write is version-gated: the merge reads a PINNED
    snapshot version and passes it as ``expected_version``, so a
    concurrent writer landing between the scan and the commit raises
    ``ConcurrentWriteError`` (failing the batch; the retry re-reads and
    re-merges) instead of being silently overwritten with state derived
    from the stale read (r12 streaming review). A malformed change row
    (NULL/unknown op) also fails the batch loudly — a poison message
    must be fixed or filtered upstream, never silently dropped."""
    from ..operators.merge import apply_cdc

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        v = table.latest_version()
        current = table.scan(version=v)
        merged = apply_cdc(current, batch_df, keys, op_col=op_col, seq_col=seq_col)
        # txn marker rides in the same commit as the data: a replayed
        # batch_id no-ops, a crash mid-write leaves the old version live
        table.overwrite(merged, txn=(app_id, batch_id), expected_version=v)

    return sink


def kafka_source_options(
    bootstrap_servers: str, topic: str, *, read_committed: bool = True, starting: str = "earliest"
) -> dict[str, str]:
    """S8/ST3 — reader options matching the reference consumer
    (``Kafka/consumer.py:4-10``: read_committed isolation, explicit
    offsets; offset commits live in the checkpoint instead of
    ``enable.auto.commit=False`` + manual ``commit()``)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting,
        "kafka.isolation.level": "read_committed" if read_committed else "read_uncommitted",
        "failOnDataLoss": "true",
    }


def kafka_sink_options(bootstrap_servers: str, topic: str, checkpoint_dir: str) -> dict[str, str]:
    """S17/ST1/ST2 — writer options for exactly-once-shaped produce: the
    checkpoint provides idempotent epoch commits (the reference's
    ``enable.idempotence`` + transactional_id + init/begin/commit/abort,
    ``Kafka/transaction/producer.py:6-21``, with no user-managed
    transaction code)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint_dir,
    }


def apply_kafka_source(reader, bootstrap_servers: str, topic: str, **kw):
    """Wire ``kafka_source_options`` onto a ``DataStreamReader`` —
    format("kafka") + every option VERBATIM (key and value untouched).
    Takes the reader rather than the session so the plumbing is testable
    without a broker: the parity test passes a recording stand-in and
    asserts nothing is renamed, dropped, or stringified differently."""
    r = reader.format("kafka")
    for k, v in kafka_source_options(bootstrap_servers, topic, **kw).items():
        r = r.option(k, v)
    return r


def apply_kafka_sink(writer, bootstrap_servers: str, topic: str, checkpoint_dir: str):
    """Wire ``kafka_sink_options`` onto a ``DataStreamWriter`` verbatim
    (format("kafka") + options; see ``apply_kafka_source``)."""
    w = writer.format("kafka")
    for k, v in kafka_sink_options(bootstrap_servers, topic, checkpoint_dir).items():
        w = w.option(k, v)
    return w


def to_kafka_payload(df: DataFrame, key_col: str, value_cols: list[str] | None = None) -> DataFrame:
    """Project a frame into the kafka sink contract: STRING ``key`` +
    JSON ``value`` of the payload columns — the producer-side framing the
    reference does by hand (``KFK/producer.py:3-16`` json.dumps per
    message), expressed as one codegen'd projection."""
    cols = value_cols or [c for c in df.columns if c != key_col]
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*cols)).alias("value"),
    )
