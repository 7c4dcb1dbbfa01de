"""Per-query timeout + audit surface (plans/audit.py).

Reference parity: utils/ThreadManagement.scala (scans killed at their
timeout, loudly) and audit/AuditWriter.scala (per-query who/what/when/
hits rows).
"""

import time

import pytest
from pyspark.sql import functions as F

from geomesa_spark.plans.audit import AuditedRunner, QueryTimeout


def test_complete_query_records_hits(spark, tmp_path):
    runner = AuditedRunner(spark, str(tmp_path / "audit"), user="alice")
    df = spark.range(1000).where(F.col("id") % 2 == 0)
    hits = runner.run(df, description="even ids")
    assert hits == 500
    rows = runner.audit_table().collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.user == "alice" and r.outcome == "complete" and r.hits == 500
    assert r.description == "even ids" and r.elapsed_sec >= 0


def test_timeout_cancels_job_group(spark):
    runner = AuditedRunner(spark)
    # a query that would run for minutes: wide range cross join
    big = spark.range(2_000_000_000).crossJoin(
        spark.range(1000).toDF("j")).selectExpr("sum(id + j) s")
    t0 = time.time()
    with pytest.raises(QueryTimeout):
        runner.run(big, description="runaway", timeout_sec=3.0)
    # cancelled well before the query could finish
    assert time.time() - t0 < 60
    assert runner.records[-1].outcome == "timeout"


def test_error_recorded(spark):
    runner = AuditedRunner(spark)
    # the failing expression sits in the WHERE clause so .count() cannot
    # prune it away
    df = spark.range(10).where("ifnull(assert_true(id < 5), true)")
    with pytest.raises(Exception):
        runner.run(df, description="boom")
    assert runner.records[-1].outcome == "error"


def test_timeout_does_not_affect_other_queries(spark):
    """Cancellation is scoped to the job group: a following query on the
    same session runs normally (the reference kills ONE scan, not the
    connection)."""
    runner = AuditedRunner(spark)
    big = spark.range(2_000_000_000).crossJoin(
        spark.range(1000).toDF("j")).selectExpr("sum(id + j) s")
    with pytest.raises(QueryTimeout):
        runner.run(big, timeout_sec=2.0)
    assert runner.run(spark.range(100), description="after") == 100
