"""Arrow export surface, lambda merged view, and approximate-stat operators
(HLL cardinality / count-min frequency — the reference's sketch stats)."""

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from geomesa_spark.sources import arrow_io
from geomesa_spark.streaming import lambda_view


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    # unpersist on teardown: a cached raw-parquet plan would otherwise be
    # substituted into OTHER tests' identical scans (plan-shape assertions)
    df = spark.read.parquet(f"{sf_dir}/events.parquet").cache()
    yield df
    df.unpersist()


# -- arrow export ----------------------------------------------------------

def test_arrow_ipc_round_trip_sorted(events):
    df = events.select("event_id", "event_type", "value").limit(500)
    data = arrow_io.to_arrow_ipc(df, sort_by=["event_id"],
                                 dict_columns=["event_type"])
    table = arrow_io.read_arrow_ipc(data)
    assert table.num_rows == df.count()
    ids = table.column("event_id").to_pylist()
    assert ids == sorted(ids)
    assert pa.types.is_dictionary(table.schema.field("event_type").type)


def test_arrow_partition_export(events, tmp_path):
    df = events.select("event_id", "value").repartition(4)
    n_files = arrow_io.write_arrow_partitions(df, str(tmp_path / "arrow"))
    assert 1 <= n_files <= 4
    total = 0
    for f in (tmp_path / "arrow").iterdir():
        with pa.ipc.open_stream(pa.OSFile(str(f))) as r:
            total += r.read_all().num_rows
    assert total == events.count()


# -- lambda view -----------------------------------------------------------

def test_lambda_view_merges_tiers(spark):
    persistent = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0), (2, "2024-01-01 00:00:00", 2.0)],
        "user_id long, ts string, value double").withColumn("ts", F.to_timestamp("ts"))
    transient = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00", 10.0),   # newer update, shadows persistent
         (3, "2024-01-01 12:00:00", 3.0)],   # not yet persisted
        "user_id long, ts string, value double").withColumn("ts", F.to_timestamp("ts"))
    merged = {r.user_id: r.value for r in
              lambda_view.lambda_view(transient, persistent).collect()}
    assert merged == {1: 10.0, 2: 2.0, 3: 3.0}


def test_lambda_persist_aged(spark):
    transient = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0), (2, "2024-01-01 06:00:00", 2.0)],
        "user_id long, ts string, value double").withColumn("ts", F.to_timestamp("ts"))
    aged, live = lambda_view.persist_aged(transient, age_seconds=4 * 3600,
                                          now="2024-01-01 08:00:00")
    assert {r.user_id for r in aged.collect()} == {1}
    assert {r.user_id for r in live.collect()} == {2}


# -- approximate stats (sketches) ------------------------------------------

def test_hll_cardinality_within_tolerance(events):
    exact = events.select("user_id").distinct().count()
    approx = events.agg(
        F.approx_count_distinct("user_id", rsd=0.05).alias("a")).collect()[0].a
    assert abs(approx - exact) / exact < 0.15


def test_count_min_sketch_frequencies(spark, events):
    # CMS overestimates but never underestimates; heavy hitters are close
    sketch_df = events.agg(
        F.expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").alias("s"))
    assert sketch_df.collect()[0].s is not None
    exact = dict(events.groupBy("event_type").count()
                 .rdd.map(lambda r: (r.event_type, r["count"])).collect())
    assert len(exact) >= 2


def test_approx_percentile_matches_exact_order(events):
    qs = events.agg(F.expr(
        "percentile_approx(value, array(0.25e0, 0.5e0, 0.75e0), 10000)"
    ).alias("q")).collect()[0].q
    assert qs[0] <= qs[1] <= qs[2]
    lo, hi = events.agg(F.min("value"), F.max("value")).collect()[0]
    assert lo <= qs[0] and qs[2] <= hi


# -- sketch merge associativity ---------------------------------------------
# The reference's stats suite (geomesa-utils-parent .../stats/*Test, e.g.
# MinMaxTest/CountStatTest "merge" cases and StatsBasedEstimatorTest)
# asserts that per-split sketches combined with Stat.+ equal the sketch of
# the whole dataset, and that sketches survive serialization.  The Spark
# analog: aggregation results must be invariant to partitioning (partial
# aggs merge associatively on executors), and a materialized per-partition
# sketch column unioned with hll_union_agg must estimate the same value as
# the one-shot global sketch.

class TestStatMergeAssociativity:
    def test_hll_invariant_to_partitioning(self, events):
        outs = [
            df.agg(F.approx_count_distinct("user_id", rsd=0.02).alias("a"))
              .collect()[0].a
            for df in (events.coalesce(1),
                       events.repartition(7, "event_type"),
                       events.repartition(29))
        ]
        # HLL++ register merge is associative/commutative: identical, not
        # merely close, across any partitioning of the same rows
        assert outs[0] == outs[1] == outs[2]

    def test_hll_sketch_union_equals_global(self, events):
        # per-partition-key sketches (serialized binary column), merged with
        # hll_union_agg == the global single-pass sketch estimate
        per_key = (events.groupBy("event_type")
                   .agg(F.hll_sketch_agg("user_id").alias("sk")))
        merged = per_key.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n")
        ).collect()[0].n
        direct = events.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n")
        ).collect()[0].n
        assert merged == direct

    def test_hll_sketch_binary_round_trip(self, events, tmp_path):
        # serialization round-trip: sketch binaries written to parquet and
        # read back merge to the same estimate
        per_key = (events.groupBy("event_type")
                   .agg(F.hll_sketch_agg("user_id").alias("sk")))
        p = str(tmp_path / "sk.parquet")
        per_key.write.parquet(p)
        rt = events.sparkSession.read.parquet(p).agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n")
        ).collect()[0].n
        want = per_key.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n")
        ).collect()[0].n
        assert rt == want

    def test_percentile_approx_invariant_to_partitioning(self, events):
        expr = F.expr(
            "percentile_approx(value, array(0.25e0, 0.5e0, 0.75e0), 10000)")
        a = events.coalesce(1).agg(expr.alias("q")).collect()[0].q
        b = events.repartition(13).agg(expr.alias("q")).collect()[0].q
        # KLL/GK-style quantile merge keeps the answer within the sketch's
        # rank-error bound; with accuracy 10000 over sf-scale inputs the
        # quartiles coincide exactly on this data
        assert a == b
