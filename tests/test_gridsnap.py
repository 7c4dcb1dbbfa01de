"""GridSnapTest.scala port — pixel-assignment (grid snap) parity.

The reference snaps points onto density/raster grids with
GridSnap.scala:23 (floor((x - xmin) / dx), upper edge clamped into the
last cell, out-of-bounds -> -1 i.e. never rendered); DensityScan and
RenderingGrid build every heatmap pixel through it.  Our engine inlines
the same math into operators/tiling.density as Catalyst expressions, so
these ports drive the PUBLIC operator on the reference test's fixtures
(GridSnapTest.scala:29-121) and assert the reference's expected cells.

Cell centers are reconstructed from the returned (px, py) as
xmin + dx * (px + 0.5), the same formula as GridSnap.x/y (xOffset + dx*i).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from geomesa_spark.operators.tiling import density


def _snap_px(spark, pts, envelope, w, h):
    """(px, py) per input point via the public density operator, tagged
    so each fixture point maps back to its own pixel (weight=point id)."""
    df = spark.createDataFrame(
        [(float(x), float(y), i) for i, (x, y) in enumerate(pts)],
        "lon double, lat double, pid int")
    # one point per pid -> sum(pid) groups to the point itself
    out = (density(df, envelope, w, h, weight=F.col("pid").cast("double"))
           .collect())
    by_pid = {}
    for r in out:
        # weight holds the pid sum; a collision would mean two fixture
        # points snapped to one cell — fixtures below are chosen 1:1
        by_pid[int(r.weight)] = (r.px, r.py)
    return by_pid


def test_snap_to_middle_of_grid_cell(spark):
    """GridSnapTest 'snap to the middle of a grid cell': bbox
    (0,4)x(-4,0), 4x4 grid; every fixture point lands in the reference's
    expected cell (asserted via the reconstructed cell center)."""
    env = (0.0, -4.0, 4.0, 0.0)
    # (point, expected snap center) straight from the reference test
    cases = [
        ((0.0, -4.0), (0.5, -3.5)),
        ((0.1, -3.9), (0.5, -3.5)),
        ((0.9, -3.1), (0.5, -3.5)),
        ((1.0, -3.0), (1.5, -2.5)),
        ((1.1, -2.9), (1.5, -2.5)),
        ((1.9, -2.1), (1.5, -2.5)),
        ((3.0, -1.0), (3.5, -0.5)),
        ((3.1, -0.9), (3.5, -0.5)),
        ((3.9, -0.1), (3.5, -0.5)),
        ((4.0, 0.0), (3.5, -0.5)),   # max edge -> last cell, not dropped
    ]
    dx = (env[2] - env[0]) / 4
    dy = (env[3] - env[1]) / 4
    # distinct points share expected cells -> snap one at a time (the
    # pid-sum trick needs unique cells per batch)
    for (x, y), (cx, cy) in cases:
        got = _snap_px(spark, [(x, y)], env, 4, 4)
        px, py = got[0]
        assert env[0] + dx * (px + 0.5) == cx, (x, y)
        assert env[1] + dy * (py + 0.5) == cy, (x, y)


def test_min_max_edges_clamp_into_last_cell(spark):
    """GridSnapTest 'handle min/max': i(0)=0, j(0)=0, i(10)=99, j(10)=9
    on a 100x10 grid over (0,10)x(0,10)."""
    env = (0.0, 0.0, 10.0, 10.0)
    got = _snap_px(spark, [(0.0, 0.0)], env, 100, 10)
    assert got[0] == (0, 0)
    got = _snap_px(spark, [(10.0, 10.0)], env, 100, 10)
    assert got[0] == (99, 9)


def test_out_of_bounds_points_never_render(spark):
    """GridSnapTest 'handle out of bounds points': i(-1)=j(-1)=i(11)=
    j(11)=-1 — the reference's -1 means 'no cell'; the engine expresses
    the same semantics by dropping the row before snapping
    (DensityScan renders only features hitting the grid)."""
    env = (0.0, 0.0, 10.0, 10.0)
    pts = [(-1.0, 5.0), (5.0, -1.0), (11.0, 5.0), (5.0, 11.0)]
    df = spark.createDataFrame([(float(x), float(y)) for x, y in pts],
                               "lon double, lat double")
    assert density(df, env, 100, 10).count() == 0


def test_no_floating_point_errors(spark):
    """GridSnapTest 'not have floating point errors': for every cell of a
    100x100 grid over (0,10)x(0,10), snapping the cell's own CENTER
    (x(i) = xmin + dx/2 + dx*i, float64 like Scala's Double) returns the
    same cell — x(i(x(i))) == x(i) round-trip stability."""
    env = (0.0, 0.0, 10.0, 10.0)
    w = h = 100
    dx = (env[2] - env[0]) / w
    dy = (env[3] - env[1]) / h
    centers = [(env[0] + dx / 2 + dx * i, env[1] + dy / 2 + dy * i)
               for i in range(w)]
    df = spark.createDataFrame(
        [(x, y, i) for i, (x, y) in enumerate(centers)],
        "lon double, lat double, pid int")
    got = (density(df, env, w, h, weight=F.col("pid").cast("double"))
           .collect())
    assert len(got) == w  # no two centers merged
    for r in got:
        assert (r.px, r.py) == (int(r.weight), int(r.weight))
