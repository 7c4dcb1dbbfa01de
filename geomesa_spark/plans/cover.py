"""Driver-side cover planning: query geometry -> cell ranges -> predicates.

This is the Spark analog of the reference's range planning
(Z3IndexKeySpace.getRanges -> getRangeBytes, Z3IndexKeySpace.scala:161-238):
instead of byte ranges scanned by tablet servers, we emit

* Catalyst range predicates on the ``z2``/``cell`` columns (Iceberg/parquet
  min-max file skipping + partition pruning do the pruning), and
* exact cell-id lists for join keys (each point belongs to exactly ONE cell,
  so cell-cover joins need no boundary dedupe on the point side).

Budgets follow the reference: <= 2000 ranges/query, BFS recursion 7
(conf/QueryProperties.scala:23, ZN.scala:293).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from geomesa_spark.cells import grid
from geomesa_spark.cells.z2 import Z2SFC
from geomesa_spark.cells.zn import DEFAULT_MAX_RANGES, IndexRange
from geomesa_spark.geom import model

_Z2 = Z2SFC(31)


def z2_ranges(boxes: list[tuple[float, float, float, float]],
              max_ranges: int = DEFAULT_MAX_RANGES) -> list[IndexRange]:
    return _Z2.ranges(boxes, max_ranges=max_ranges)


def z2_range_predicate(z2_col: Column,
                       boxes: list[tuple[float, float, float, float]],
                       max_ranges: int = 64) -> Column:
    """OR of BETWEENs on the z2 column covering the boxes. Kept coarse
    (max_ranges default 64) because it exists for file/partition pruning; the
    exact lon/lat predicate re-check runs anyway (the reference's 'loose bbox'
    + Z3Filter re-check split, Z3IndexKeySpace.useFullFilter:240-254)."""
    ranges = z2_ranges(boxes, max_ranges=max_ranges)
    preds = [z2_col.between(r.lower, r.upper) for r in ranges]
    return reduce(lambda a, b: a | b, preds)


def bbox_cell_cover(xmin: float, ymin: float, xmax: float, ymax: float,
                    res: int) -> list[int]:
    return grid.cover_bbox(xmin, ymin, xmax, ymax, res)


def geometry_cell_cover(geom: model.Geometry, res: int) -> list[int]:
    """Cells whose square intersects the geometry (exact test per cell —
    covers of polygons drop fully-outside cells, unlike a plain bbox cover)."""
    xmin, ymin, xmax, ymax = geom.bounds
    cells = grid.cover_bbox(xmin, ymin, xmax, ymax, res)
    if isinstance(geom, model.Polygon) or isinstance(geom, model.MultiPolygon):
        out = []
        for cid in cells:
            cb = model.box(*grid.cell_bounds(cid))
            if geom.intersects(cb):
                out.append(cid)
        return out
    return cells


def pick_cover_resolution(boxes: list[tuple[float, float, float, float]],
                          target_cells: int = 256) -> int:
    """One shared resolution for a polygon batch: finest resolution keeping
    every polygon's cover under the budget."""
    res = grid.MAX_RES
    for b in boxes:
        res = min(res, grid.pick_resolution(*b, target_cells=target_cells))
    return res
