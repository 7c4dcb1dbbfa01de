"""Attribute index: secondary sorted tables with covering vs join-back reads.

Reference parity: GeoMesa's attribute index stores rows re-keyed by a
lexicoded attribute value; when the index "covers" the queried columns the
scan answers directly, otherwise GeoMesa joins back to the record/id index
(AttributeJoinIndex, geomesa-accumulo-indices/.../AttributeJoinIndex
.scala:19-56 — cost-multiplied ~x10, StrategyDecider).

Spark mapping: the secondary table is a narrow projection
(attr, id, covered columns...) range-partitioned and sorted by the
attribute, so attribute range/equality predicates prune files via parquet
min/max stats.  ``query`` serves covered projections straight from the
narrow table and transparently joins back to the primary table by feature
id when asked for non-covered columns — the ~x10-cost decision surfaced as
an explicit, inspectable plan choice.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geomesa_spark.sources.layout import _read_text, _write_text

MANIFEST = "_attr_manifest.json"


def write_attribute_index(df: DataFrame, path: str, *, attr: str,
                          id_col: str, covered: list[str] | None = None,
                          target_partitions: int | None = None) -> None:
    """Write the narrow secondary table sorted by ``attr``.

    ``covered``: extra columns stored in the index (the reference's column
    groups / covering-index config, conf/ColumnGroups.scala analog).
    """
    spark = df.sparkSession
    covered = covered or []
    cols = [attr, id_col] + [c for c in covered if c not in (attr, id_col)]
    n = target_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    narrow = (df.select(*cols)
              .repartitionByRange(n, F.col(attr))
              .sortWithinPartitions(attr, id_col))
    narrow.write.mode("overwrite").parquet(f"{path}/index")
    _write_text(spark, f"{path}/{MANIFEST}", json.dumps(
        {"attr": attr, "id_col": id_col, "covered": cols}))


def ensure_attribute_index(df: DataFrame, path: str, *, attr: str,
                           id_col: str, covered: list[str] | None = None,
                           target_partitions: int | None = None) -> None:
    """Write-once secondary index: skip the write when a manifest with the
    same (attr, id_col, covered-column) shape already exists (the
    layout.ensure_indexed / write_ivf_index pattern — the index is built at
    ingest, not per query)."""
    spark = df.sparkSession
    cols = [attr, id_col] + [c for c in (covered or [])
                             if c not in (attr, id_col)]
    try:
        meta = json.loads(_read_text(spark, f"{path}/{MANIFEST}"))
        if (meta.get("attr"), meta.get("id_col"), meta.get("covered")) == \
                (attr, id_col, cols):
            return
    except Exception:
        pass
    write_attribute_index(df, path, attr=attr, id_col=id_col,
                          covered=covered, target_partitions=target_partitions)


class AttributeIndex:
    def __init__(self, spark: SparkSession, path: str, primary: DataFrame):
        self.spark = spark
        self.path = path
        self.primary = primary
        meta = json.loads(_read_text(spark, f"{path}/{MANIFEST}"))
        self.attr = meta["attr"]
        self.id_col = meta["id_col"]
        self.covered = meta["covered"]

    def index_df(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/index")

    def is_covering(self, columns: list[str]) -> bool:
        return set(columns) <= set(self.covered)

    def query(self, predicate: str, columns: list[str]) -> DataFrame:
        """Attribute-predicate scan returning ``columns``.

        Covered -> narrow sorted scan only (file-skipping on the attr
        predicate); not covered -> index scan for ids + broadcast-friendly
        join back to the primary table on the feature id.
        """
        hits = self.index_df().where(predicate)
        if self.is_covering(columns):
            return hits.select(*columns)
        ids = hits.select(self.id_col)
        return (self.primary.join(ids, self.id_col, "left_semi")
                .select(*columns))
