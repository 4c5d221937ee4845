"""§2.9 streaming: incremental runs over the events file-stream must match
batch results; exactly-once / incremental semantics via checkpoints."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_spark.catalog import load_table
from data_engineering_spark.streaming.streams import (
    events_stream,
    foreach_batch_parquet_sink,
    kafka_sink_options,
    kafka_source_options,
    run_available_now,
    streaming_dedup,
    tumbling_counts,
)


def test_available_now_matches_batch(spark, sf_dir, tmp_path):
    """ST6 — AvailableNow incremental run of the tumbling agg equals the
    batch computation (complete parity between the two modes)."""
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = tumbling_counts(events_stream(spark, sf_dir), watermark="0 seconds")
    q = (
        stream.writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", sink)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(sink)
    events = load_table(spark, sf_dir, "events")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "event_type", "cnt")
    )
    # append mode emits a window only once the watermark passes its end —
    # the final in-flight window stays open, by design
    closed = batch.filter(F.col("window_end") <= F.lit(max_ts))
    assert got.count() == closed.count()
    assert got.exceptAll(closed).count() == 0

    # second AvailableNow run with same checkpoint: no new input → no new rows
    q2 = (
        tumbling_counts(events_stream(spark, sf_dir), watermark="0 seconds")
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", sink)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q2.awaitTermination()
    assert spark.read.parquet(sink).count() == closed.count()


def test_foreach_batch_sink(spark, sf_dir, tmp_path):
    """ST5 — foreachBatch bulk-flush: every micro-batch lands as one
    atomic directory keyed by batch_id."""
    sink_dir = str(tmp_path / "bulk")
    ckpt = str(tmp_path / "ckpt2")
    stream = events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    q = (
        stream.writeStream.foreachBatch(foreach_batch_parquet_sink(sink_dir))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(sink_dir)
    expected = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase").count()
    assert out.count() == expected


def test_streaming_dedup(spark, sf_dir, tmp_path):
    """Stateful dedup within watermark: replaying the same file twice in
    one stream keeps one copy per event_id."""
    import shutil

    src = str(tmp_path / "src")
    import os

    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", f"{src}/a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", f"{src}/b.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from data_engineering_spark.streaming.streams import _events_raw_schema

    schema, ts_expr = _events_raw_schema(sf_dir)
    raw = spark.readStream.schema(schema).format("parquet").load(src)
    stream = streaming_dedup(raw.withColumn("ts", F.expr(ts_expr)))
    sink = str(tmp_path / "deduped")
    q = (
        stream.writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .option("path", sink)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    n_unique = load_table(spark, sf_dir, "events").count()
    assert spark.read.parquet(sink).count() == n_unique


def test_events_schema_probe_three_dtype_branches(spark, sf_dir, tmp_path):
    """_events_raw_schema mirrors catalog.load_table's three-way ts
    branch: nanos → long rebuild, tz-naive micros → NTZ cast, tz-AWARE
    micros → TimestampType passthrough (the drift class that broke the
    round-3 batch loader must not break streaming either)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from data_engineering_spark.streaming.streams import _events_raw_schema

    base = pq.read_table(f"{sf_dir}/events.parquet")
    idx = base.schema.get_field_index("ts")
    cases = {
        "ns": (pa.timestamp("ns"), T.LongType, "div 1000"),
        "us_naive": (pa.timestamp("us"), T.TimestampNTZType, "cast(ts as timestamp)"),
        "us_utc": (pa.timestamp("us", tz="UTC"), T.TimestampType, "ts"),
    }
    import os

    for name, (arrow_t, spark_t, frag) in cases.items():
        d = str(tmp_path / name)
        os.makedirs(d, exist_ok=True)
        col = base.column("ts").cast(arrow_t)
        pq.write_table(
            base.set_column(idx, pa.field("ts", arrow_t), col),
            f"{d}/events.parquet",
        )
        schema, expr = _events_raw_schema(d)
        assert isinstance(schema["ts"].dataType, spark_t), name
        assert frag in expr or expr == frag, (name, expr)


def test_kafka_option_builders():
    """S8/S17 — config parity with the reference's consumer/producer
    settings (read_committed isolation, checkpointed exactly-once)."""
    src = kafka_source_options("broker:9092", "events")
    assert src["kafka.isolation.level"] == "read_committed"
    assert src["subscribe"] == "events"
    sink = kafka_sink_options("broker:9092", "out", "/tmp/ckpt")
    assert sink["topic"] == "out"
    assert "checkpointLocation" in sink


class _Recorder:
    """DataStreamReader/Writer stand-in recording the fluent calls."""

    def __init__(self):
        self.fmt = None
        self.opts = {}

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self


def test_kafka_options_reach_stream_verbatim(spark, sf_dir, tmp_path):
    """S8/S17 parity: every builder option must reach readStream/
    writeStream with key AND value untouched — this fails if the
    plumbing ever renames, drops, or re-derives an option."""
    from data_engineering_spark.streaming.streams import (
        apply_kafka_sink,
        apply_kafka_source,
        to_kafka_payload,
    )

    rec = apply_kafka_source(_Recorder(), "broker:9092", "events", starting="latest")
    assert rec.fmt == "kafka"
    assert rec.opts == kafka_source_options("broker:9092", "events", starting="latest")

    rec = apply_kafka_sink(_Recorder(), "broker:9092", "out", str(tmp_path / "ck"))
    assert rec.fmt == "kafka"
    assert rec.opts == kafka_sink_options("broker:9092", "out", str(tmp_path / "ck"))

    # the same plumbing accepts the real API objects (no broker contact
    # before .load()/.start(), so construction must succeed)
    apply_kafka_source(spark.readStream, "broker:9092", "events")
    apply_kafka_sink(
        events_stream(spark, sf_dir).writeStream, "broker:9092", "out", str(tmp_path / "ck2")
    )

    # producer framing: string key + JSON value (KFK/producer.py shape)
    payload = to_kafka_payload(load_table(spark, sf_dir, "events"), "event_id")
    assert payload.columns == ["key", "value"]
    assert dict(payload.dtypes) == {"key": "string", "value": "string"}
    row = payload.first()
    import json as _json

    assert set(_json.loads(row.value)) == {"ts", "user_id", "event_type", "value", "props"}


def test_stateful_running_totals_matches_batch(spark, sf_dir, tmp_path):
    """Custom applyInPandasWithState operator: final per-user state after
    draining the stream equals the batch groupBy."""
    from data_engineering_spark.streaming.streams import stateful_running_totals

    stream = stateful_running_totals(events_stream(spark, sf_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("running_totals")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_df = spark.sql(
        "SELECT user_id, n_events, total_value FROM running_totals"
    ).toPandas()
    # update mode may emit a row per micro-batch; the LAST row per user is
    # the final state
    got = {
        int(r.user_id): (int(r.n_events), float(r.total_value))
        for r in got_df.itertuples()
    }
    batch = {
        int(r.user_id): (int(r.n), round(float(r.total), 2))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == batch


def test_session_windows_incremental_matches_batch(spark, sf_dir, tmp_path):
    """Session windows computed incrementally (AvailableNow, watermark 0)
    equal the batch session_window aggregation."""
    from data_engineering_spark.streaming.streams import session_windows

    sink = str(tmp_path / "sess_sink")
    ckpt = str(tmp_path / "sess_ckpt")
    stream = session_windows(events_stream(spark, sf_dir), gap="10 minutes", watermark="0 seconds")
    q = (
        stream.writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", sink)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start, r.n_events, r.session_value)
        for r in spark.read.parquet(sink).collect()
    }
    events = load_table(spark, sf_dir, "events")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    # append mode emits a session once the watermark passes its end
    # (last event + gap); sessions still open at end-of-stream stay held
    batch = {
        (r.user_id, r.w.start, r.n_events, r.session_value)
        for r in (
            events.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("session_value"),
            )
            .filter(F.col("w.end") <= F.lit(max_ts))
            .collect()
        )
    }
    assert got == batch


def test_foreach_batch_replay_is_idempotent(spark, sf_dir, tmp_path):
    """A failed micro-batch is retried with the SAME batch_id; the sink
    must replace (not append) the per-batch directory or replays double
    the data and break exactly-once."""
    from data_engineering_spark.streaming.streams import foreach_batch_parquet_sink

    sink_dir = str(tmp_path / "replay")
    batch = load_table(spark, sf_dir, "events").limit(100)
    sink = foreach_batch_parquet_sink(sink_dir)
    sink(batch, 7)
    sink(batch, 7)  # simulated retry of the same micro-batch
    assert spark.read.parquet(sink_dir).count() == 100


def test_lake_streaming_sink_exactly_once(spark, sf_dir, tmp_path):
    """Streaming append into a transaction-logged table: each micro-batch
    is one atomic commit with a txn marker; a replayed batch_id no-ops
    (exactly-once at the log level, no per-batch directories)."""
    from data_engineering_spark.sources.txlog import LakeTable
    from data_engineering_spark.streaming.streams import lake_streaming_sink

    table = LakeTable(spark, str(tmp_path / "laketbl"))
    events = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    table.create(events.limit(0).coalesce(1))  # schema-only seed
    sink = lake_streaming_sink(table, app_id="events_ingest")
    q = (
        events_stream(spark, sf_dir)
        .select("event_id", "event_type", "value")
        .writeStream.foreachBatch(lambda df, bid: sink(df, bid))
        .option("checkpointLocation", str(tmp_path / "ckpt_lake"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    total = events.count()
    assert table.scan().count() == total
    # replay the last committed batch id → no duplication
    last_batch = max(
        t_ver for app, t_ver in table._snapshot().txns.items() if app == "events_ingest"
    )
    sink(events.limit(50), last_batch)
    assert table.scan().count() == total


def test_cdc_upsert_sink_applies_and_dedups_replay(spark, tmp_path):
    """Streaming CDC merge: per micro-batch the change feed is collapsed
    and merged into the keyed table; replays skip via the txn marker in
    the data commit itself."""
    from data_engineering_spark.sources.txlog import LakeTable
    from data_engineering_spark.streaming.streams import cdc_upsert_sink

    table = LakeTable(spark, str(tmp_path / "cdctbl"))
    table.create(
        spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double").coalesce(1)
    )
    sink = cdc_upsert_sink(table, keys=["k"], app_id="cdc")
    b0 = spark.createDataFrame(
        [(1, 1, "U", 11.0), (3, 1, "D", 0.0), (4, 1, "I", 40.0)],
        "k long, seq long, op string, v double",
    )
    sink(b0, 0)
    assert {r.k: r.v for r in table.scan().collect()} == {1: 11.0, 2: 20.0, 4: 40.0}
    state_v = table.latest_version()
    sink(b0, 0)  # replayed micro-batch — must not re-apply
    assert table.latest_version() == state_v
    b1 = spark.createDataFrame([(2, 1, "U", 99.0)], "k long, seq long, op string, v double")
    sink(b1, 1)
    assert {r.k: r.v for r in table.scan().collect()} == {1: 11.0, 2: 99.0, 4: 40.0}


def test_interval_join_incremental_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream interval join (click → purchase within 10 min):
    the incremental two-stream execution must emit exactly the batch
    join's pairs."""
    from data_engineering_spark.streaming.streams import events_stream, interval_join

    def split(src, kind, id_alias, ts_alias):
        return src.filter(F.col("event_type") == kind).select(
            F.col("event_id").alias(id_alias),
            "user_id",
            F.col("ts").alias(ts_alias),
        )

    stream = events_stream(spark, sf_dir)
    joined = interval_join(
        split(stream, "click", "click_id", "l_ts"),
        split(stream, "purchase", "purchase_id", "r_ts"),
    )
    sink = str(tmp_path / "ij_sink")
    q = (
        joined.writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "ij_ckpt"))
        .option("path", sink)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.read.parquet(sink).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    batch = interval_join(
        split(ev, "click", "click_id", "l_ts"),
        split(ev, "purchase", "purchase_id", "r_ts"),
    )
    expected = {(r.click_id, r.purchase_id) for r in batch.collect()}
    assert got == expected and expected  # non-vacuous


def test_multi_microbatch_incremental_aggregation(spark, sf_dir, tmp_path):
    """Incremental processing across MANY micro-batches (the daily-batch
    cadence ST6 models): with the input split into files and
    maxFilesPerTrigger=1, an AvailableNow run must process batch-by-batch
    through the same checkpoint and still produce exactly the batch
    answer — state carries across micro-batches, nothing is double- or
    under-counted."""
    import os
    import shutil

    src = str(tmp_path / "parts")
    os.makedirs(src)
    # split events into 3 replay files by event_id stripe
    ev = load_table(spark, sf_dir, "events")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.parquet(f"{src}/f{i}")
    for i in range(3):
        part = [f for f in os.listdir(f"{src}/f{i}") if f.endswith(".parquet")][0]
        shutil.move(f"{src}/f{i}/{part}", f"{src}/batch{i}.parquet")
        shutil.rmtree(f"{src}/f{i}")

    schema = ev.schema
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    sink_dir = str(tmp_path / "inc_sink")
    seen_batches = []

    def sink(df, batch_id):
        seen_batches.append(batch_id)
        (df.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
         .withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(sink_dir))

    q = (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "inc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(seen_batches) == 3  # one micro-batch per file
    got = (
        spark.read.parquet(sink_dir)
        .groupBy("event_type")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    want = {r.event_type: r.cnt for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert {r.event_type: r.cnt for r in got} == want


def test_incremental_minhash_dedup_matches_batch(spark, sf_dir, tmp_path):
    """North-star pipeline op: foreachBatch MinHash ingest over a real
    multi-file document stream emits EXACTLY the one-shot near-dup pair
    set — incremental ≡ batch regardless of micro-batching (LSH
    collision is per-pair, so each pair surfaces once, at its
    later-arriving member's batch). Also asserts replay idempotency:
    re-running a batch_id replaces its state/pair partitions instead of
    double-appending (dynamic partition overwrite, the S12 pattern)."""
    from data_engineering_spark.operators.dedup import minhash_near_dedup
    from data_engineering_spark.streaming.incremental_dedup import (
        incremental_minhash_sink,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_src")
    docs.repartition(3).write.parquet(src)

    index_dir = str(tmp_path / "bucket_index")
    store_dir = str(tmp_path / "shingle_store")
    pairs_dir = str(tmp_path / "pairs")
    sink = incremental_minhash_sink(
        index_dir, store_dir, pairs_dir, max_bucket=None
    )

    raw = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per file
        .parquet(src)
    )
    q = (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(pairs_dir).select("id_a", "id_b", "jaccard")
    want = minhash_near_dedup(docs, max_bucket=None)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0

    # replayed micro-batch (same batch_id, same docs — a foreachBatch
    # retry after a mid-write failure) must leave every output byte-
    # equivalent: the batch's own state/pair partitions are overwritten,
    # never double-appended, and its prior partial state is excluded
    # from the corpus side while re-deriving pairs
    idx = spark.read.parquet(index_dir)
    assert idx.select("ingest_batch").distinct().count() == 3
    idx_count = idx.count()  # snapshot BEFORE the replay rewrites files
    last_batch = int(idx.agg(F.max("ingest_batch").alias("m")).collect()[0].m)
    replay_ids = (
        spark.read.parquet(store_dir)
        .filter(F.col("ingest_batch") == last_batch)
        .select("doc_id")
    )
    sink(docs.join(replay_ids, "doc_id", "left_semi"), last_batch)
    got2 = spark.read.parquet(pairs_dir).select("id_a", "id_b", "jaccard")
    assert got2.count() == want.count()
    assert got2.exceptAll(want).count() == 0
    assert spark.read.parquet(index_dir).count() == idx_count


def test_incremental_embedding_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Embedding-modality incremental ingest: the foreachBatch sink over
    a real multi-file embedding stream emits exactly the one-batch
    (n=1) replay's pair set — batching must not change the pair log —
    and a replayed micro-batch leaves every output byte-equivalent."""
    from data_engineering_spark.streaming.incremental_dedup import (
        incremental_embedding_replay,
        incremental_embedding_sink,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    src = str(tmp_path / "emb_src")
    emb.repartition(3).write.parquet(src)

    index_dir = str(tmp_path / "emb_index")
    store_dir = str(tmp_path / "emb_store")
    pairs_dir = str(tmp_path / "emb_pairs")
    sink = incremental_embedding_sink(
        index_dir, store_dir, pairs_dir, dim=64, threshold=0.4, max_bucket=None
    )

    raw = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "emb_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(pairs_dir).select("id_a", "id_b", "sim")
    want = incremental_embedding_replay(
        emb, dim=64, n_batches=1, threshold=0.4, max_bucket=None
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0

    idx = spark.read.parquet(index_dir)
    idx_count = idx.count()
    last_batch = int(idx.agg(F.max("ingest_batch").alias("m")).collect()[0].m)
    replay_ids = (
        spark.read.parquet(store_dir)
        .filter(F.col("ingest_batch") == last_batch)
        .select("vec_id")
    )
    sink(emb.join(replay_ids, "vec_id", "left_semi"), last_batch)
    got2 = spark.read.parquet(pairs_dir).select("id_a", "id_b", "sim")
    assert got2.count() == want.count()
    assert got2.exceptAll(want).count() == 0
    assert spark.read.parquet(index_dir).count() == idx_count


def test_embedding_cap_binding_is_prefix_faithful(spark):
    """When a bucket CROSSES max_bucket mid-stream, the append-only pair
    log keeps exactly the pairs admitted while the post-append
    population was still within cap — a superset of the capped one-shot
    (which drops the whole bucket) and a subset of the uncapped run.
    The expected count is recomputed independently here from the batch
    assignment: a planted cluster of identical vectors shares every
    band bucket, so a pair lands in the log iff the cumulative cluster
    population at its later member's batch is <= cap."""
    from data_engineering_spark.streaming.incremental_dedup import (
        incremental_embedding_replay,
    )

    n, cap, n_batches = 12, 5, 4
    df = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(1, n + 1)],
        ["vec_id", "embedding"],
    )
    kw = dict(dim=4, n_batches=n_batches, threshold=0.9)
    uncapped = incremental_embedding_replay(df, max_bucket=None, **kw)
    capped = incremental_embedding_replay(df, max_bucket=cap, **kw)
    oneshot_capped = incremental_embedding_replay(
        df, dim=4, n_batches=1, threshold=0.9, max_bucket=cap
    )
    assert uncapped.count() == n * (n - 1) // 2
    # one-shot: every bucket holds all 12 > cap — dropped outright
    assert oneshot_capped.count() == 0

    # independent expectation from the deterministic batch assignment
    sizes = {
        r.b: r.c
        for r in df.select(
            F.pmod(F.xxhash64("vec_id"), F.lit(n_batches)).alias("b")
        ).groupBy("b").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    expected, cum = 0, 0
    for k in range(n_batches):
        s = sizes.get(k, 0)
        if cum + s <= cap:
            expected += s * cum + s * (s - 1) // 2
        cum += s
    assert 0 < expected < n * (n - 1) // 2  # the planted case really binds
    got = capped.collect()
    assert len(got) == expected
    # subset of the uncapped log, superset of the capped one-shot
    assert capped.exceptAll(uncapped).count() == 0


def test_streaming_percolate_matches_batch(spark, sf_dir, tmp_path):
    """Streaming alerting: percolating each micro-batch of a real
    multi-file document stream through foreach_batch_parquet_sink emits
    exactly the one-shot match set (percolation is stateless per doc),
    and a replayed batch_id overwrites its own partition rather than
    double-appending alerts."""
    from data_engineering_spark.operators.text import percolate
    from data_engineering_spark.queries_llm import STORED_ALERTS

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_src")
    docs.repartition(3).write.parquet(src)
    alerts_dir = str(tmp_path / "alerts")

    sink = foreach_batch_parquet_sink(
        alerts_dir, transform=lambda df: percolate(df, STORED_ALERTS)
    )
    raw = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(alerts_dir).select("query_id", "doc_id")
    want = percolate(docs, STORED_ALERTS)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0

    # replay a micro-batch (foreachBatch retry): its partition must be
    # REPLACED, never appended — re-run the last batch_id with the whole
    # corpus (worst-case replay) and check that partition holds exactly
    # the recomputed alerts while the other partitions are untouched
    import os

    batches = sorted(
        int(d.split("=")[1]) for d in os.listdir(alerts_dir) if d.startswith("batch_id=")
    )
    assert len(batches) == 3
    last = batches[-1]
    before_others = {
        b: spark.read.parquet(f"{alerts_dir}/batch_id={b}").count()
        for b in batches[:-1]
    }
    sink(docs, last)
    assert spark.read.parquet(f"{alerts_dir}/batch_id={last}").count() == want.count()
    for b, n in before_others.items():
        assert spark.read.parquet(f"{alerts_dir}/batch_id={b}").count() == n


def test_events_stream_scopes_nanos_conf_to_nanos_data(spark, sf_dir):
    """events_stream must not mutate session parquet semantics unless the
    footer probe actually reports nanos (r12 streaming review: the
    unconditional nanosAsLong set leaked into every other parquet read
    of the session)."""
    import pyarrow.parquet as pq

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    events_stream(spark, sf_dir)
    is_nanos = (
        getattr(pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type, "unit", None)
        == "ns"
    )
    got = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    if is_nanos:
        assert got == "true"  # the stream genuinely needs it for its lifetime
    else:
        assert got is None  # micros-era data: session semantics untouched
