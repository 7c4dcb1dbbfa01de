"""Density grids and deterministic tile pyramids.

Spark reimplementation of the reference's density scan / heatmap surface
(iterators/DensityScan.scala:29-48,95-136; grid snap semantics
GridSnap.scala:23, RenderingGrid.scala:25): features are floor-snapped onto a
width x height grid over an envelope and their weights summed per pixel.

A tile pyramid is the same computation per (zoom, tile): global pixel index
gx = floor((lon+180)/360 * 2^zoom * tile_px), tile = gx div tile_px, pixel =
gx mod tile_px. Everything is native Catalyst (one shuffle per aggregation,
map-side partial aggregation for free); multiple zoom levels are produced in
ONE pass via posexplode of the per-zoom keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def density(df: DataFrame, envelope: tuple, width: int, height: int, *,
            lon_col: str = "lon", lat_col: str = "lat",
            weight: Column | str | None = None) -> DataFrame:
    """Sparse (px, py) -> weight grid over an envelope.

    Rows outside the envelope are dropped (DensityScan renders only features
    hitting the grid); the envelope's max edge maps to the last pixel
    (GridSnap floor + clamp semantics).
    """
    xmin, ymin, xmax, ymax = envelope
    lon, lat = F.col(lon_col), F.col(lat_col)
    w = F.lit(1.0) if weight is None else (F.col(weight) if isinstance(weight, str) else weight)
    px = F.least(F.floor((lon - F.lit(xmin)) / F.lit(xmax - xmin) * F.lit(width)),
                 F.lit(width - 1)).cast("int")
    py = F.least(F.floor((lat - F.lit(ymin)) / F.lit(ymax - ymin) * F.lit(height)),
                 F.lit(height - 1)).cast("int")
    return (df
            .where(lon.between(xmin, xmax) & lat.between(ymin, ymax))
            .withColumn("px", px).withColumn("py", py)
            .groupBy("px", "py")
            .agg(F.sum(w).alias("weight")))


def tile_pyramid(df: DataFrame, zooms: list[int], *, tile_px: int = 256,
                 lon_col: str = "lon", lat_col: str = "lat",
                 weight: Column | str | None = None) -> DataFrame:
    """(zoom, tx, ty, px, py, weight, cnt) for all zoom levels in one pass.

    Deterministic tile assignment: plate carrée, ty increases northward,
    floor snap with the +90/+180 edges clamped into the last tile — matching
    the engine's GridSnap-parity pixel math (tests port F7 semantics).
    """
    lon, lat = F.col(lon_col), F.col(lat_col)
    w = F.lit(1.0) if weight is None else (F.col(weight) if isinstance(weight, str) else weight)

    structs = []
    for z in zooms:
        n_px = (1 << z) * tile_px
        gx = F.least(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n_px)),
                     F.lit(n_px - 1)).cast("long")
        gy = F.least(F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(n_px)),
                     F.lit(n_px - 1)).cast("long")
        structs.append(F.struct(
            F.lit(z).alias("zoom"),
            (gx / tile_px).cast("int").alias("tx"),
            (gy / tile_px).cast("int").alias("ty"),
            (gx % tile_px).cast("int").alias("px"),
            (gy % tile_px).cast("int").alias("py"),
        ))

    return (df
            .where(lon.between(-180.0, 180.0) & lat.between(-90.0, 90.0))
            .withColumn("__w", w)
            .withColumn("__t", F.explode(F.array(*structs)))
            .select("__t.zoom", "__t.tx", "__t.ty", "__t.px", "__t.py", "__w")
            .groupBy("zoom", "tx", "ty", "px", "py")
            .agg(F.sum("__w").alias("weight"), F.count("*").alias("cnt")))


def write_tile_pyramid(df: DataFrame, path: str, zooms: list[int], **kwargs) -> None:
    """Materialize the pyramid partitioned by zoom (partition pruning on read)."""
    tiles = tile_pyramid(df, zooms, **kwargs)
    (tiles
     .repartition("zoom", "tx")
     .sortWithinPartitions("zoom", "tx", "ty", "px", "py")
     .write.mode("overwrite").partitionBy("zoom").parquet(path))
