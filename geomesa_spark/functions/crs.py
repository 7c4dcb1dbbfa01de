"""CRS reprojection as native Catalyst expressions.

Reference parity: QueryPlanner applies an optional result reprojection
(planning/QueryPlanner.scala:94-98, GeoTools CRS transform); the dominant
production pair is EPSG:4326 (lon/lat) <-> EPSG:3857 (spherical web
mercator) — exactly the transform the tile pyramid consumers use.

Pure arithmetic -> whole-stage codegen, no UDFs; formulas follow the EPSG
spherical-mercator definition with R = 6378137 (WGS84 semi-major).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

R_MAJOR = 6378137.0
MAX_LAT = 85.05112877980659   # atan(sinh(pi)) — mercator validity bound


def to_mercator_x(lon: Column) -> Column:
    return F.lit(R_MAJOR) * F.radians(lon)


def to_mercator_y(lat: Column) -> Column:
    clamped = F.when(lat > MAX_LAT, F.lit(MAX_LAT)) \
               .when(lat < -MAX_LAT, F.lit(-MAX_LAT)).otherwise(lat)
    rad = F.radians(clamped)
    return F.lit(R_MAJOR) * F.log(F.tan(F.lit(3.141592653589793 / 4.0) + rad / 2.0))


def from_mercator_lon(x: Column) -> Column:
    return F.degrees(x / F.lit(R_MAJOR))


def from_mercator_lat(y: Column) -> Column:
    return F.degrees(2.0 * F.atan(F.exp(y / F.lit(R_MAJOR))) - F.lit(3.141592653589793 / 2.0))


def reproject_4326_to_3857(df: DataFrame, lon_col: str = "lon",
                           lat_col: str = "lat", x_col: str = "x",
                           y_col: str = "y") -> DataFrame:
    return (df.withColumn(x_col, to_mercator_x(F.col(lon_col)))
            .withColumn(y_col, to_mercator_y(F.col(lat_col))))


def reproject_3857_to_4326(df: DataFrame, x_col: str = "x", y_col: str = "y",
                           lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    return (df.withColumn(lon_col, from_mercator_lon(F.col(x_col)))
            .withColumn(lat_col, from_mercator_lat(F.col(y_col))))


def mercator_sql(lon: str, lat: str) -> tuple[str, str]:
    """The same transform in portable SQL (for the DuckDB oracle)."""
    x = f"{R_MAJOR!r} * radians({lon})"
    clamped = (f"(CASE WHEN {lat} > {MAX_LAT!r} THEN {MAX_LAT!r} "
               f"WHEN {lat} < {-MAX_LAT!r} THEN {-MAX_LAT!r} ELSE {lat} END)")
    y = (f"{R_MAJOR!r} * ln(tan({3.141592653589793 / 4.0!r} "
         f"+ radians({clamped}) / 2.0))")
    return x, y
