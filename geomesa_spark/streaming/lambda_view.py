"""Lambda-architecture merged view: transient (streaming) tier ∪ persistent
(batch) tier.

Reference parity: the Lambda datastore queries both the Kafka cache and the
persistent store and unions results, with the transient tier winning for
features not yet persisted (geomesa-lambda/.../LambdaQueryRunner.scala:24-66);
a background task persists aged entries (stream/kafka/DataStorePersistence
.scala).

Spark mapping: the transient tier is the live upsert view (streaming/upsert
.latest_feature_state materialized to a table each micro-batch, or any
DataFrame of the current state); the persistent tier is the batch table.
``lambda_view`` unions them keeping the max-event-time row per feature id;
``persist_aged`` is the flush: rows older than the age threshold move to the
persistent table and would be dropped from the transient tier.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lambda_view(transient: DataFrame, persistent: DataFrame,
                fid_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """One logical layer over both tiers: latest row per feature id.

    Transient rows shadow persistent rows with equal timestamps (the
    reference prefers the in-memory tier for un-persisted updates).
    """
    t = transient.withColumn("__tier", F.lit(0))
    p = persistent.withColumn("__tier", F.lit(1))
    w = Window.partitionBy(fid_col).orderBy(F.desc(ts_col), F.asc("__tier"))
    return (t.unionByName(p)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__tier"))


def persist_aged(transient: DataFrame, ts_col: str = "ts",
                 age_seconds: int = 3600,
                 now: Optional[str] = None) -> tuple[DataFrame, DataFrame]:
    """Split the transient tier into (to_persist, still_transient) by age."""
    now_expr = (F.lit(now).cast("timestamp") if now is not None
                else F.current_timestamp())
    cutoff = now_expr - F.expr(f"INTERVAL {age_seconds} SECONDS")
    return (transient.where(F.col(ts_col) <= cutoff),
            transient.where(F.col(ts_col) > cutoff))
