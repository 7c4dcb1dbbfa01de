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


@pytest.fixture()
def input_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    # batch 1: initial states
    _write(d / "a.parquet", [
        (1, "2024-01-01 00:00:00", 1.0),
        (2, "2024-01-01 00:00:00", 2.0),
        (3, "2024-01-01 00:00:00", 3.0),
    ])
    # batch 2: newer update for 1, LATE (older) update for 2, new key 4
    _write(d / "b.parquet", [
        (1, "2024-01-02 00:00:00", 10.0),
        (2, "2023-12-31 00:00:00", 99.0),
        (4, "2024-01-01 12:00:00", 4.0),
    ])
    return str(d)


def _run_upsert(spark, input_dir, tmp_path, ttl=None):
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(input_dir))
    live = upsert.latest_feature_state(stream, "user_id", "ts",
                                       ttl_seconds=ttl)
    q = (live.writeStream.format("memory").queryName("live_view")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM live_view").toPandas()
    spark.catalog.dropTempView("live_view")
    return out


def test_upsert_event_time_ordering(spark, input_dir, tmp_path):
    out = _run_upsert(spark, input_dir, tmp_path)
    # final state per key = max-ts emitted row
    final = (out.sort_values("ts").groupby("user_id").last().reset_index())
    state = {r.user_id: (str(r.ts), r.value) for r in final.itertuples()}
    assert state[1] == ("2024-01-02 00:00:00", 10.0)   # newer won
    assert state[2] == ("2024-01-01 00:00:00", 2.0)    # late update ignored
    assert state[3] == ("2024-01-01 00:00:00", 3.0)
    assert state[4] == ("2024-01-01 12:00:00", 4.0)
    # the late row for key 2 must NOT have been emitted at all
    assert not ((out.user_id == 2) & (out.value == 99.0)).any()


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
