"""Per-query timeout enforcement + audit logging.

Engine analog of the reference's managed scans and query auditing:

* utils/ThreadManagement.scala — every scan registers with a timeout and
  is killed (with a loud error) when it exceeds it.  Spark mapping: each
  audited query runs under its own JOB GROUP; a watchdog timer cancels
  the group (`cancelJobGroup`, interruptOnCancel) at the deadline, which
  aborts every task of that query — and only that query — cluster-wide.
* audit/AuditWriter.scala + AuditedEvent — who ran what, when, how long,
  how many hits.  Spark mapping: one row per completed/cancelled/failed
  query appended to a parquet audit table (the same append pattern the
  layout's `_metrics` table uses), queryable like any other table.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


class QueryTimeout(RuntimeError):
    """Raised when an audited query exceeds its timeout (the reference's
    'scan terminated due to timeout' error, ThreadManagement.scala)."""


_AUDIT_SCHEMA = ("query_id string, user string, description string, "
                 "started_at double, elapsed_sec double, hits long, "
                 "outcome string")


@dataclass
class AuditRecord:
    query_id: str
    user: str
    description: str
    started_at: float
    elapsed_sec: float
    hits: int
    outcome: str          # 'complete' | 'timeout' | 'error'


class AuditedRunner:
    """Runs query DataFrames under a job group with timeout + audit rows.

    ``audit_path=None`` keeps records in memory only (``records``);
    otherwise each record is also appended to the parquet audit table.
    """

    def __init__(self, spark: SparkSession, audit_path: str | None = None,
                 user: str = "unknown"):
        self.spark = spark
        self.audit_path = audit_path
        self.user = user
        self.records: list[AuditRecord] = []

    def audit_table(self) -> DataFrame:
        if self.audit_path:
            return self.spark.read.parquet(self.audit_path)
        return self.spark.createDataFrame(
            [(r.query_id, r.user, r.description, r.started_at,
              r.elapsed_sec, r.hits, r.outcome) for r in self.records],
            _AUDIT_SCHEMA)

    def _record(self, rec: AuditRecord) -> None:
        self.records.append(rec)
        if self.audit_path:
            self.spark.createDataFrame(
                [(rec.query_id, rec.user, rec.description, rec.started_at,
                  rec.elapsed_sec, rec.hits, rec.outcome)],
                _AUDIT_SCHEMA).coalesce(1) \
                .write.mode("append").parquet(self.audit_path)

    def run(self, df: DataFrame, description: str = "",
            timeout_sec: float | None = None,
            action=None):
        """Execute ``action(df)`` (default ``df.count()``) under a fresh
        job group; cancel the group at ``timeout_sec`` and raise
        QueryTimeout.  Always appends an audit row.  Returns the action's
        result (hit count by default)."""
        sc = self.spark.sparkContext
        qid = uuid.uuid4().hex[:12]
        action = action or (lambda d: d.count())
        cancelled = threading.Event()

        def watchdog():
            if not done.wait(timeout_sec):
                cancelled.set()
                sc.cancelJobGroup(qid)

        done = threading.Event()
        timer = None
        if timeout_sec is not None:
            timer = threading.Thread(target=watchdog, daemon=True)
            timer.start()

        sc.setJobGroup(qid, description or "audited query",
                       interruptOnCancel=True)
        t0 = time.time()
        try:
            result = action(df)
        except Exception as e:
            done.set()
            elapsed = time.time() - t0
            if cancelled.is_set():
                self._record(AuditRecord(qid, self.user, description, t0,
                                         round(elapsed, 3), -1, "timeout"))
                raise QueryTimeout(
                    f"query {qid!r} ({description!r}) exceeded "
                    f"{timeout_sec}s and was cancelled") from e
            self._record(AuditRecord(qid, self.user, description, t0,
                                     round(elapsed, 3), -1, "error"))
            raise
        finally:
            done.set()
            sc.setJobGroup(None, None)
        elapsed = time.time() - t0
        hits = result if isinstance(result, int) else len(result) \
            if hasattr(result, "__len__") else -1
        self._record(AuditRecord(qid, self.user, description, t0,
                                 round(elapsed, 3), hits, "complete"))
        return result
