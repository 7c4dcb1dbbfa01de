"""Structured Streaming live-layer tests: upsert state, event-time ordering,
TTL wiring, playback — the KafkaFeatureCache semantics (SURVEY.md §2.9).
"""

import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType,
                               TimestampType)

from geomesa_spark.streaming import upsert

SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("value", DoubleType()),
])


def _write(path, rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)


BATCH_1 = [
    (1, "2024-01-01 00:00:00", 1.0),
    (2, "2024-01-01 00:00:00", 2.0),
    (3, "2024-01-01 00:00:00", 3.0),
]
# newer update for 1, LATE (older) update for 2, new key 4
BATCH_2 = [
    (1, "2024-01-02 00:00:00", 10.0),
    (2, "2023-12-31 00:00:00", 99.0),
    (4, "2024-01-01 12:00:00", 4.0),
]


@pytest.fixture()
def input_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write(d / "a.parquet", BATCH_1)
    _write(d / "b.parquet", BATCH_2)
    return str(d)


def _drain(spark, input_dir, ckpt, out_dir, ttl=None):
    """availableNow drain via foreachBatch -> parquet (checkpoint-recoverable
    — the memory sink cannot resume from a checkpoint). Returns rows
    emitted by THIS run only (batch ids beyond the previous high-water)."""
    import glob
    import os

    def read_out():
        if not glob.glob(f"{out_dir}/*.parquet"):
            return None
        return spark.read.parquet(out_dir)

    prev = read_out()
    prev_max = (prev.agg(F.max("batch_id")).collect()[0][0]
                if prev is not None else -1)

    stream = spark.readStream.schema(SCHEMA).parquet(input_dir)
    live = upsert.latest_feature_state(stream, "user_id", "ts",
                                       ttl_seconds=ttl)

    def sink(batch_df, batch_id):
        if batch_df.count():
            (batch_df.withColumn("batch_id", F.lit(batch_id))
             .write.mode("append").parquet(out_dir))

    q = (live.writeStream.foreachBatch(sink)
         .outputMode("update")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    os.makedirs(out_dir, exist_ok=True)
    out = read_out()
    if out is None:
        import pandas as pd_
        return pd_.DataFrame(columns=["user_id", "ts", "value", "batch_id"])
    return out.where(F.col("batch_id") > prev_max).toPandas()


def _run_upsert(spark, input_dir, tmp_path, ttl=None):
    return _drain(spark, input_dir, str(tmp_path / "ckpt"),
                  str(tmp_path / "out"), ttl=ttl)


def _run_upsert_ordered(spark, tmp_path, ttl=None):
    """Two sequential availableNow runs over ONE checkpoint: batch order is
    deterministic (file listing order within one run is not)."""
    d = tmp_path / "ordered"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt_ordered")
    out_dir = str(tmp_path / "out_ordered")
    _write(d / "a.parquet", BATCH_1)
    out1 = _drain(spark, str(d), ckpt, out_dir, ttl=ttl)
    _write(d / "b.parquet", BATCH_2)
    out2 = _drain(spark, str(d), ckpt, out_dir, ttl=ttl)
    return out1, out2


def test_upsert_event_time_ordering(spark, tmp_path):
    out1, out2 = _run_upsert_ordered(spark, tmp_path)
    state1 = {r.user_id: r.value for r in out1.itertuples()}
    assert state1 == {1: 1.0, 2: 2.0, 3: 3.0}
    # second run: newer update for 1 emitted, late update for 2 DROPPED
    # (event-time ordering), new key 4 emitted — key 3 unchanged, no emit
    state2 = {r.user_id: (str(r.ts), r.value) for r in out2.itertuples()}
    assert state2 == {1: ("2024-01-02 00:00:00", 10.0),
                      4: ("2024-01-01 12:00:00", 4.0)}
    assert not ((out2.user_id == 2) & (out2.value == 99.0)).any()


def test_upsert_matches_batch_oracle(spark, input_dir, tmp_path):
    out = _run_upsert(spark, input_dir, tmp_path)
    final = (out.sort_values("ts").groupby("user_id").last().reset_index()
             .sort_values("user_id").reset_index(drop=True))
    batch = spark.read.schema(SCHEMA).parquet(input_dir)
    want = (upsert.latest_state_batch(batch, "user_id", "ts")
            .orderBy("user_id").toPandas())
    pd.testing.assert_frame_equal(
        final[["user_id", "ts", "value"]], want[["user_id", "ts", "value"]],
        check_dtype=False)


def test_upsert_with_ttl_runs(spark, input_dir, tmp_path):
    out = _run_upsert(spark, input_dir, tmp_path, ttl=3600)
    assert len(out) >= 4


def test_age_off(spark, input_dir):
    batch = spark.read.schema(SCHEMA).parquet(input_dir)
    kept = upsert.age_off(batch, "ts", ttl_seconds=36 * 3600,
                          now="2024-01-02 12:00:00")
    assert {r.user_id for r in kept.collect()} == {1, 4}


def test_playback_emits_in_event_time_order(spark, input_dir, tmp_path):
    batch = spark.read.schema(SCHEMA).parquet(input_dir)
    stream = upsert.playback(spark, batch, "ts", rows_per_second=10)
    q = (stream.writeStream.format("memory").queryName("playback_view")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_pb"))
         .trigger(processingTime="500 milliseconds").start())
    deadline = time.time() + 60
    while time.time() < deadline:
        n = spark.sql("SELECT count(*) c FROM playback_view").collect()[0].c
        if n >= 3:
            break
        time.sleep(1)
    q.stop()
    got = spark.sql("SELECT * FROM playback_view").toPandas()
    spark.catalog.dropTempView("playback_view")
    assert len(got) >= 3
    ordered = batch.orderBy("ts").toPandas()["ts"].tolist()
    # emitted rows are a prefix of the event-time order
    assert sorted(got["ts"].tolist()) == ordered[:len(got)]


def test_kafka_message_decode(spark):
    """parse_feature_messages: kafka-shaped batch -> feature rows, with
    tombstone surfacing (KafkaDataStore SerDe analog, decode path only —
    no broker in the sandbox)."""
    import json

    import pandas as pd

    from geomesa_spark.streaming.kafka import (parse_feature_messages,
                                               parsed_field_names)
    schema = "event_id bigint, ts timestamp, lon double, lat double"
    assert parsed_field_names(schema) == ["event_id", "ts", "lon", "lat"]
    msgs = [
        (b"f1", json.dumps({"event_id": 1, "ts": "2024-01-01 00:00:00",
                            "lon": 10.0, "lat": 20.0}).encode()),
        (b"f2", json.dumps({"event_id": 2, "ts": "2024-01-01 00:01:00",
                            "lon": 11.0, "lat": 21.0}).encode()),
        (b"f1", None),  # delete tombstone
    ]
    pdf = pd.DataFrame({
        "key": [bytearray(k) for k, _ in msgs],
        "value": [bytearray(v) if v is not None else None for _, v in msgs],
        "topic": "features", "partition": 0,
        "offset": range(len(msgs)),
        "timestamp": pd.Timestamp("2024-01-01"), "timestampType": 0})
    df = spark.createDataFrame(pdf)
    out = parse_feature_messages(df, schema).collect()
    rows = {(r.fid, r["__tombstone"]): r for r in out}
    assert rows[("f1", False)].event_id == 1
    assert rows[("f2", False)].lon == 11.0
    assert ("f1", True) in rows  # tombstone kept, feature fields null
    assert rows[("f1", True)].event_id is None


def test_kafka_stream_raises_without_connector(spark):
    from geomesa_spark.streaming.kafka import kafka_stream
    import pytest as _pytest
    try:
        df = kafka_stream(spark, "localhost:9092", "t",
                          "event_id bigint, ts timestamp")
    except RuntimeError as e:
        assert "connector" in str(e)
    else:
        # connector present in this environment: the stream is unstarted
        # and schema-correct
        assert "fid" in df.columns


def test_tumbling_window_with_watermark(spark, input_dir, tmp_path):
    """Windowed live metrics (SURVEY §2.9: tumbling aggregation comes free
    via F.window + watermark): per-12h event counts over the file stream,
    drained with availableNow; result matches the batch window agg."""
    stream = spark.readStream.schema(SCHEMA).parquet(input_dir)
    agg = (stream
           .withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "12 hours").alias("w"))
           .agg(F.count("*").alias("n"),
                F.sum("value").alias("total")))
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("win_view")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.w.start.isoformat(), r.n, float(r.total))
           for r in spark.sql("SELECT * FROM win_view").collect()}

    batch = spark.read.schema(SCHEMA).parquet(input_dir)
    want = {(r.w.start.isoformat(), r.n, float(r.total)) for r in
            (batch.groupBy(F.window("ts", "12 hours").alias("w"))
             .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
             .collect())}
    assert got == want and len(got) >= 3
