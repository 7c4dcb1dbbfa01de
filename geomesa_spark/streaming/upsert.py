"""Streaming live-layer operators: upsert-by-feature-id state, event-time
ordering, TTL age-off, and playback.

Reference parity (geomesa-kafka):
* latest_feature_state — KafkaFeatureCache upsert semantics
  (kafka/index/KafkaFeatureCacheImpl.scala; ordering config
  index/FeatureStateFactory.scala:60-74): one live row per feature id,
  event-time ordered — an update older than the current state is ignored —
  implemented with applyInPandasWithState keyed on the feature id.
* TTL expiry (FeatureStateFactory.scala:150-190) — processing-time state
  timeout: aged state is dropped and (optionally) emitted as a tombstone.
* age_off — batch AgeOffFilter / DtgAgeOffFilter (index-api/.../filters/
  AgeOffFilter.scala): WHERE ts > now() - ttl.
* playback — PlaybackIterator (utils/iterators/PlaybackIterator.scala):
  replay a historical table in event-time order at a simulated rate,
  implemented as a rate-source x static-sequence join.

Scale notes: state is partitioned by feature id (Spark state store
shuffles once on the key); throughput is bounded by state-store updates,
not data volume. Late events are dropped in the state function, so
out-of-order Kafka partitions don't regress the live view.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def latest_feature_state(stream: DataFrame, key_col: str, ts_col: str,
                         ttl_seconds: Optional[int] = None) -> DataFrame:
    """Live upsert view: one row per key holding the max-event-time record.

    Emits an updated row per key per micro-batch when the state changes.
    Updates with an event time older than the current state are ignored
    (event-time ordering).  With ``ttl_seconds``, idle state times out and
    is dropped (processing-time TTL, like the reference's ingest-time
    expiry).
    """
    fields = [f for f in stream.schema.fields]
    out_schema = StructType(fields)
    state_schema = StructType([f for f in fields if f.name != key_col])
    val_names = [f.name for f in fields if f.name != key_col]
    ts_idx = val_names.index(ts_col)
    col_order = [f.name for f in fields]

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        best: Optional[tuple] = state.get if state.exists else None
        changed = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(ts_col, kind="stable")
            row = pdf.iloc[-1]
            vals = tuple(row[c] for c in val_names)
            if best is None or vals[ts_idx] > best[ts_idx]:
                best, changed = vals, True
        if best is not None and changed:
            state.update(best)
            if ttl_seconds is not None:
                state.setTimeoutDuration(ttl_seconds * 1000)
            out = {key_col: [key[0]]}
            out.update({c: [best[i]] for i, c in enumerate(val_names)})
            yield pd.DataFrame(out)[col_order]
        elif best is not None and ttl_seconds is not None:
            state.setTimeoutDuration(ttl_seconds * 1000)

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if ttl_seconds is not None else GroupStateTimeout.NoTimeout)
    return (stream.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "update", timeout))


def latest_state_batch(df: DataFrame, key_col: str, ts_col: str,
                       tie_cols: Optional[list] = None) -> DataFrame:
    """Batch oracle for the live view: max-event-time row per key."""
    order = [F.desc(ts_col)] + [F.desc(c) for c in (tie_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))


def age_off(df: DataFrame, ts_col: str, ttl_seconds: int,
            now: Optional[Any] = None) -> DataFrame:
    """AgeOffFilter: keep rows younger than the TTL."""
    now_expr = F.lit(now).cast("timestamp") if now is not None \
        else F.current_timestamp()
    return df.where(
        F.col(ts_col) > now_expr - F.expr(f"INTERVAL {ttl_seconds} SECONDS"))


def playback(spark: SparkSession, df: DataFrame, ts_col: str,
             rows_per_second: int = 10) -> DataFrame:
    """Replay a static table in event-time order at a simulated rate.

    Row i (in ts order) is released when rate-source tick i arrives, so the
    stream emits rows_per_second rows/sec in historical order.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in df.columns if c != ts_col]
    seq = df.withColumn(
        "_seq", (F.row_number().over(Window.orderBy(*order)) - 1).cast("long"))
    rate = (spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second).load()
            .select(F.col("value").alias("_seq")))
    return rate.join(seq, "_seq", "inner").drop("_seq")
