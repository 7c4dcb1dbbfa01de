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


# ---------------------------------------------------------------------------
# Ellipsoidal transverse mercator (UTM zones), Karney/Krüger series —
# the arbitrary-CRS piece of QueryPlanner.scala:297-301's reprojection.
# Pure Catalyst arithmetic (sinh/cosh/atan2/ln), whole-stage codegen.
# ---------------------------------------------------------------------------

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
UTM_K0 = 0.9996
_N = WGS84_F / (2.0 - WGS84_F)
_E = (WGS84_F * (2.0 - WGS84_F)) ** 0.5
# rectifying radius + Krüger alpha/beta/delta series (3rd order in n —
# sub-millimeter within UTM zone widths)
_A_BAR = WGS84_A / (1 + _N) * (1 + _N ** 2 / 4 + _N ** 4 / 64)
_ALPHA = (_N / 2 - 2 * _N ** 2 / 3 + 5 * _N ** 3 / 16,
          13 * _N ** 2 / 48 - 3 * _N ** 3 / 5,
          61 * _N ** 3 / 240)
_BETA = (_N / 2 - 2 * _N ** 2 / 3 + 37 * _N ** 3 / 96,
         _N ** 2 / 48 + _N ** 3 / 15,
         17 * _N ** 3 / 480)
_DELTA = (2 * _N - 2 * _N ** 2 / 3 - 2 * _N ** 3,
          7 * _N ** 2 / 3 - 8 * _N ** 3 / 5,
          56 * _N ** 3 / 15)


def _atanh(x: Column) -> Column:
    return 0.5 * F.log((1.0 + x) / (1.0 - x))


def utm_zone_of(lon: float) -> int:
    return int((lon + 180.0) // 6.0) % 60 + 1


def utm_exprs(lon: Column, lat: Column, zone: int,
              south: bool = False) -> tuple[Column, Column]:
    """(easting, northing) on WGS84 UTM ``zone`` as native columns."""
    lam0 = math_radians(zone * 6.0 - 183.0)
    phi = F.radians(lat)
    dlam = F.radians(lon) - lam0
    sphi = F.sin(phi)
    t = F.sinh(_atanh(sphi) - _E * _atanh(F.lit(_E) * sphi))
    xi_p = F.atan2(t, F.cos(dlam))
    eta_p = _atanh(F.sin(dlam) / F.sqrt(1.0 + t * t))
    xi, eta = xi_p, eta_p
    for j, a in enumerate(_ALPHA, start=1):
        xi = xi + F.lit(a) * F.sin(2.0 * j * xi_p) * F.cosh(2.0 * j * eta_p)
        eta = eta + F.lit(a) * F.cos(2.0 * j * xi_p) * F.sinh(2.0 * j * eta_p)
    east = F.lit(500_000.0) + F.lit(UTM_K0 * _A_BAR) * eta
    north = F.lit(10_000_000.0 if south else 0.0) + F.lit(UTM_K0 * _A_BAR) * xi
    return east, north


def utm_inverse_exprs(east: Column, north: Column, zone: int,
                      south: bool = False) -> tuple[Column, Column]:
    """(lon, lat) degrees from WGS84 UTM ``zone`` coordinates."""
    lam0 = math_radians(zone * 6.0 - 183.0)
    xi = (north - F.lit(10_000_000.0 if south else 0.0)) / F.lit(UTM_K0 * _A_BAR)
    eta = (east - F.lit(500_000.0)) / F.lit(UTM_K0 * _A_BAR)
    xi_p, eta_p = xi, eta
    for j, b in enumerate(_BETA, start=1):
        xi_p = xi_p - F.lit(b) * F.sin(2.0 * j * xi) * F.cosh(2.0 * j * eta)
        eta_p = eta_p - F.lit(b) * F.cos(2.0 * j * xi) * F.sinh(2.0 * j * eta)
    chi = F.asin(F.sin(xi_p) / F.cosh(eta_p))
    phi = chi
    for j, d in enumerate(_DELTA, start=1):
        phi = phi + F.lit(d) * F.sin(2.0 * j * chi)
    lam = F.atan2(F.sinh(eta_p), F.cos(xi_p))
    return F.degrees(lam + F.lit(lam0)), F.degrees(phi)


def math_radians(deg: float) -> float:
    import math
    return math.radians(deg)


def _parse_epsg(crs: str | int) -> int:
    if isinstance(crs, int):
        return crs
    s = str(crs).upper().replace("EPSG:", "").strip()
    return int(s)


def reproject(df: DataFrame, src: str | int, dst: str | int,
              x_col: str = "x", y_col: str = "y",
              out_x: str = "x2", out_y: str = "y2") -> DataFrame:
    """General reprojection between supported CRSs: EPSG:4326,
    EPSG:3857 (spherical mercator), and EPSG:326zz / 327zz (WGS84 UTM
    north/south).  Unknown codes raise ValueError — the reference
    delegates others to GeoTools (QueryPlanner.scala:297-301)."""
    s, d = _parse_epsg(src), _parse_epsg(dst)
    # normalize source to lon/lat
    if s == 4326:
        lon, lat = F.col(x_col), F.col(y_col)
    elif s == 3857:
        lon, lat = from_mercator_lon(F.col(x_col)), from_mercator_lat(F.col(y_col))
    elif 32601 <= s <= 32660 or 32701 <= s <= 32760:
        lon, lat = utm_inverse_exprs(F.col(x_col), F.col(y_col),
                                     s % 100, south=s >= 32701)
    else:
        raise ValueError(f"unsupported source CRS: {src}")
    # lon/lat to target
    if d == 4326:
        ox, oy = lon, lat
    elif d == 3857:
        ox, oy = to_mercator_x(lon), to_mercator_y(lat)
    elif 32601 <= d <= 32660 or 32701 <= d <= 32760:
        ox, oy = utm_exprs(lon, lat, d % 100, south=d >= 32701)
    else:
        raise ValueError(f"unsupported target CRS: {dst}")
    return df.withColumn(out_x, ox).withColumn(out_y, oy)
