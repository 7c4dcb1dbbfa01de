"""Point-in-polygon / spatial joins.

The engine's core operator, replacing the reference's grid-partitioned
sweepline join (GeoMesaJoinRelation.scala:41-91, RelationUtils.grid:30-70):

* both sides get a grid ``cell`` key (points: exactly ONE cell each — no
  boundary duplication on the point side, which eliminates the reference's
  dedupe TODO at RelationUtils.scala:38; polygons: their cell cover),
* small polygon sets take the **broadcast** path (cover computed driver-side,
  broadcast hash join on cell — the north rule's small-side strategy),
* large polygon sets take the **salted sort-merge** path: polygon cover rows
  are replicated to every salt value, points hash-salted by id, join key =
  (cell, salt) — GeoMesa's shard-prefix skew handling (ShardStrategy.scala:
  75-83) expressed as explicit salt columns,
* an Arrow-batched numpy refine applies the exact predicate; rectangles skip
  the refine (exact cover shortcut).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from geomesa_spark.functions.cell_functions import cell_col, salt_col
from geomesa_spark.geom import algos, model, wkt
from geomesa_spark.geom.wkb import wkb_loads
from geomesa_spark.plans.cover import geometry_cell_cover, pick_cover_resolution
from geomesa_spark.plans.query import _is_rectangle

DEFAULT_SALTS = 4  # geomesa.z.splits default (Conversions.scala:307-318)


def _refine_udf(predicate: str = "intersects"):
    """(lon, lat, poly_wkb) -> bool; caches parsed polygons per batch and
    evaluates each distinct polygon against its points in one numpy call."""

    def refine(lon: pd.Series, lat: pd.Series, poly: pd.Series) -> pd.Series:
        x = lon.to_numpy(np.float64)
        y = lat.to_numpy(np.float64)
        out = np.zeros(len(x), dtype=bool)
        groups: dict[bytes, list[int]] = {}
        for i, b in enumerate(poly):
            if b is not None:
                groups.setdefault(bytes(b), []).append(i)
        for b, idx in groups.items():
            g = wkb_loads(b)
            ii = np.asarray(idx)
            if predicate == "intersects":
                m = algos.points_intersect(x[ii], y[ii], g)
            elif predicate == "contains":
                m = np.zeros(len(ii), dtype=bool)
                for comp in g._components():
                    if isinstance(comp, model.Polygon):
                        m |= algos.points_in_polygon(x[ii], y[ii], comp) == algos.IN
            else:
                raise ValueError(predicate)
            out[ii] = m
        return pd.Series(out)

    return F.pandas_udf(refine, BooleanType())


def _polygons_to_local(polygons) -> list[tuple]:
    """Normalize a small polygon collection to [(id, Geometry, wkb)]."""
    from geomesa_spark.geom.wkb import wkb_dumps
    out = []
    for pid, g in polygons:
        geom = wkt.wkt_loads(g) if isinstance(g, str) else g
        out.append((pid, geom, wkb_dumps(geom)))
    return out


def pip_join_broadcast(points: DataFrame, polygons, *, res: int | None = None,
                       lon_col: str = "lon", lat_col: str = "lat",
                       poly_id_col: str = "poly_id",
                       predicate: str = "intersects",
                       keep_geom: bool = False) -> DataFrame:
    """Broadcast PIP join: ``polygons`` is a small driver-side collection
    [(id, wkt-or-Geometry)]. Returns points rows + ``poly_id``.

    Plan shape: points -> native cell assignment -> broadcast hash join on
    cell -> vectorized refine (skipped for rectangles). One shuffle-free pass
    over the fact table.
    """
    spark = points.sparkSession
    polys = _polygons_to_local(polygons)
    if res is None:
        res = pick_cover_resolution([g.bounds for _, g, _ in polys])

    rows = []
    for pid, g, b in polys:
        exact_ok = _is_rectangle(g)
        for cid in geometry_cell_cover(g, res):
            # cells fully inside the polygon skip the refine (contained
            # ranges shortcut); for rectangles every cover cell that is
            # fully within the bbox is exact
            from geomesa_spark.cells.grid import cell_bounds
            cb = model.box(*cell_bounds(cid))
            contained = g.covers(cb) if not exact_ok else _bbox_covers(g.bounds, cb.bounds)
            rows.append((pid, cid, None if contained else b))
    cover_df = spark.createDataFrame(rows, schema=f"{poly_id_col} string, __cell long, __poly binary") \
        if polys and isinstance(polys[0][0], str) else \
        spark.createDataFrame(rows, schema=f"{poly_id_col} long, __cell long, __poly binary")

    pts = points.withColumn("__cell", cell_col(F.col(lon_col), F.col(lat_col), res))
    joined = pts.join(F.broadcast(cover_df), "__cell", "inner")
    refined = joined.where(F.col("__poly").isNull()
                           | _refine_udf(predicate)(F.col(lon_col), F.col(lat_col), F.col("__poly")))
    drop = ["__cell"] if keep_geom else ["__cell", "__poly"]
    return refined.drop(*drop)


def _bbox_covers(outer: tuple, inner: tuple) -> bool:
    return (outer[0] <= inner[0] and outer[1] <= inner[1]
            and outer[2] >= inner[2] and outer[3] >= inner[3])


def pip_join_smj(points: DataFrame, polygons: DataFrame, *, res: int,
                 lon_col: str = "lon", lat_col: str = "lat",
                 poly_wkb_col: str = "geom", poly_id_col: str = "poly_id",
                 predicate: str = "intersects",
                 n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Salted sort-merge PIP join for LARGE polygon sets (DataFrame side).

    ``polygons`` must carry (poly_id_col, poly_wkb_col). Polygon covers are
    computed executor-side (Arrow-batched), replicated to all salt values;
    points are salted by hash. Join key (cell, salt) spreads hot cells over
    ``n_salts`` reducers — explicit skew handling per the north rule, on top
    of AQE skew splitting.
    """
    from pyspark.sql.types import ArrayType, LongType

    def cover_udf(wkb_s: pd.Series) -> pd.Series:
        out = []
        for b in wkb_s:
            if b is None:
                out.append([])
                continue
            out.append(geometry_cell_cover(wkb_loads(bytes(b)), res))
        return pd.Series(out)

    covers = polygons.withColumn(
        "__cells", F.pandas_udf(cover_udf, ArrayType(LongType()))(F.col(poly_wkb_col)))
    poly_cells = (covers
                  .withColumn("__cell", F.explode("__cells"))
                  .withColumn("__salt", F.explode(F.array([F.lit(i) for i in range(n_salts)])))
                  .drop("__cells"))

    pts = (points
           .withColumn("__cell", cell_col(F.col(lon_col), F.col(lat_col), res))
           .withColumn("__salt", salt_col(F.col(lon_col) + F.col(lat_col), n_salts)))

    joined = pts.join(poly_cells.hint("shuffle_merge"), ["__cell", "__salt"], "inner")
    refined = joined.where(_refine_udf(predicate)(F.col(lon_col), F.col(lat_col),
                                                  F.col(poly_wkb_col)))
    return refined.drop("__cell", "__salt")
