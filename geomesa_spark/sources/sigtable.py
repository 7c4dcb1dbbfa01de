"""Write-time signature tables for the LSH / MinHash / SimHash operators.

The engine's layout story (sources/layout.py) applied to similarity
signatures: at 100 TB the banded-LSH keys, MinHash signatures + shingle
sets, and SimHash words are WRITE-TIME artifacts — computed once at ingest
and stored keyed by their join column, exactly the role the cell-id (z2/s2)
columns play for the spatial indices (reference analog: the index-table
writers under geomesa-index-api, e.g. index/z3/Z3IndexKeySpace.scala — the
key is computed when the row is written, never at query time).

Catalyst cannot reuse one exchange across differently-pruned consumers of
the same lineage (each side of a self-join re-executes the signature
computation), so ``materialize`` pushes the signature DataFrame through a
parquet round-trip: one computation, then every consumer scans the stored
table.  The oracle-checked queries route through a deterministic cache path
per (operator, dataset) and overwrite it on every call, so their timings
honestly include the single signature pass.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from geomesa_spark.sources.layout import _read_text, _write_text

CACHE_ROOT = os.environ.get(
    "SPARK_GRAFT_CACHE", os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".cache"))

SIG_MANIFEST = "_sig_manifest.json"


def cache_path(name: str, sf_dir: str, kind: str = "sigs") -> str:
    """Deterministic cached-table location for an operator + dataset
    (``kind``: 'sigs' for signature tables, 'layouts' for indexed
    layouts written by the planner-path queries)."""
    tag = os.path.basename(sf_dir.rstrip("/")) or "data"
    return os.path.join(CACHE_ROOT, kind, f"{name}_{tag}")


def materialize(df: DataFrame, path: str,
                sort_cols: list[str] | None = None) -> DataFrame:
    """Write ``df`` to parquet (overwrite) and return the read-back frame.

    Downstream consumers scan the materialized table instead of
    re-executing the signature lineage; ``sort_cols`` sorts rows within
    files so parquet row-group min/max stats support join-key skipping
    (the same physical property layout.write_indexed gives cell keys).
    """
    spark = df.sparkSession
    out = df
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def write_sig_manifest(spark: SparkSession, path: str, meta: dict) -> None:
    _write_text(spark, f"{path}/{SIG_MANIFEST}", json.dumps(meta))


def read_sig_manifest(spark: SparkSession, path: str) -> dict:
    return json.loads(_read_text(spark, f"{path}/{SIG_MANIFEST}"))
