"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline smoke check on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — matching DuckDB SQL per query for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _prep(spark: SparkSession) -> None:
    from geomesa_spark.functions import register_all
    register_all(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: broadcast PIP join + per-polygon tile rollup on sf0.001."""
    _prep(spark)
    from pyspark.sql import functions as F

    from geomesa_spark.entry_queries import PIP_POLYGONS
    from geomesa_spark.operators.pip_join import pip_join_broadcast
    from geomesa_spark.operators.tiling import tile_pyramid
    from geomesa_spark.sources.testdata import geo_events

    df = geo_events(spark, "/root/testdata/sf0.001")
    joined = pip_join_broadcast(df, PIP_POLYGONS)
    tiles = tile_pyramid(joined, [0, 2, 4], tile_px=256)
    return tiles.groupBy("zoom").agg(
        F.count("*").alias("n_pixels"),
        F.sum("cnt").alias("n_points"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator from SURVEY.md §2."""
    from geomesa_spark.entry_queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prep(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(fn) for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (same column names/rounding)."""
    from geomesa_spark.entry_queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
