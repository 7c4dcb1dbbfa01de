"""Marching-squares contour extraction (raster -> vector).

Pins: exact single-pixel diamond geometry, closed-loop topology (every
crossing point has degree 2 for interior blobs), numpy case parity, and
Spark <-> DuckDB dialect parity of the generated SQL (the same guarantee
the driver's oracle gate checks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from geomesa_spark.operators.contours import (contour_segments,
                                              marching_squares_sql)

ENV = (0.0, 0.0, 16.0, 16.0)   # (xmin, ymin, xmax, ymax), 16x16 grid => 1 deg/px


def _seg_df(spark, pts, level, w=16, h=16):
    pdf = pd.DataFrame(pts, columns=["lon", "lat"])
    return contour_segments(spark.createDataFrame(pdf), ENV, w, h, level)


def test_single_pixel_diamond(spark):
    """One hot pixel (count 10, level 4.5) yields 4 segments forming a
    diamond through the 0.55-interpolated crossings around its center."""
    pts = [(5.2, 7.3)] * 10          # pixel (5, 7), center (5.5, 7.5)
    out = _seg_df(spark, pts, 4.5).toPandas()
    assert len(out) == 4
    endpoints = set()
    for r in out.itertuples():
        endpoints.add((round(r.x1, 6), round(r.y1, 6)))
        endpoints.add((round(r.x2, 6), round(r.y2, 6)))
    t = 0.55                          # (4.5 - 10) / (0 - 10)
    assert endpoints == {
        (5.5 + t, 7.5), (5.5 - t, 7.5), (5.5, 7.5 + t), (5.5, 7.5 - t)}


def test_closed_loops_for_interior_blob(spark):
    """A blob away from the grid edge produces closed contours: every
    endpoint is shared by exactly two segments."""
    rng = np.random.RandomState(7)
    pts = np.clip(rng.normal(8.0, 1.6, (4000, 2)), 0.05, 15.95)
    out = _seg_df(spark, [tuple(p) for p in pts], 9.5).toPandas()
    assert len(out) > 8
    from collections import Counter
    deg = Counter()
    for r in out.itertuples():
        deg[(round(r.x1, 6), round(r.y1, 6))] += 1
        deg[(round(r.x2, 6), round(r.y2, 6))] += 1
    assert set(deg.values()) == {2}


def test_matches_numpy_marching_squares(spark):
    """Cell cases agree with a direct numpy recomputation of the grid."""
    rng = np.random.RandomState(3)
    pts = np.clip(rng.uniform(0, 16, (3000, 2)), 0.0, 15.999)
    level = 11.5
    out = _seg_df(spark, [tuple(p) for p in pts], level).toPandas()

    grid = np.zeros((18, 18))        # index shifted by +1 to host ci=-1
    gx = np.minimum((pts[:, 0] / 1.0).astype(int), 15)
    gy = np.minimum((pts[:, 1] / 1.0).astype(int), 15)
    np.add.at(grid, (gx + 1, gy + 1), 1)
    want_cells = set()
    for ci in range(-1, 16):
        for cj in range(-1, 16):
            v00 = grid[ci + 1, cj + 1]
            v10 = grid[ci + 2, cj + 1]
            v01 = grid[ci + 1, cj + 2]
            v11 = grid[ci + 2, cj + 2]
            cs = ((v00 > level) * 1 + (v10 > level) * 2
                  + (v11 > level) * 4 + (v01 > level) * 8)
            if cs not in (0, 15):
                want_cells.add((ci, cj))
    got_cells = set(zip(out["ci"], out["cj"]))
    assert got_cells == want_cells


def test_dialect_parity_with_duckdb(spark):
    """The generated Spark and DuckDB query texts produce identical
    floor-scaled segment sets on the same input — the oracle-gate
    guarantee, checked directly."""
    duckdb = pytest.importorskip("duckdb")
    rng = np.random.RandomState(11)
    pts = np.clip(rng.normal(6.0, 3.0, (5000, 2)), 0.0, 15.999)
    pdf = pd.DataFrame(pts, columns=["lon", "lat"])

    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("__parity_src")
    spark_sql = "WITH " + marching_squares_sql(
        "__parity_src", 7.5, 16, 16, 0.0, 16.0, 0.0, 16.0, "spark")
    got = {tuple(r) for r in spark.sql(spark_sql).collect()}

    con = duckdb.connect()
    con.register("src", pdf)
    duck_sql = "WITH " + marching_squares_sql(
        "src", 7.5, 16, 16, 0.0, 16.0, 0.0, 16.0, "duck")
    want = {tuple(r) for r in con.execute(duck_sql).fetchall()}
    assert got == want


def test_envelope_mapping(spark):
    """Non-unit envelope: outputs land in envelope coordinates."""
    pts = [(40.0 + 5.2 * (10.0 / 16), 20.0 + 7.3 * (10.0 / 16))] * 10
    out = contour_segments(
        spark.createDataFrame(pd.DataFrame(pts, columns=["lon", "lat"])),
        (40.0, 20.0, 50.0, 30.0), 16, 16, 4.5).toPandas()
    assert len(out) == 4
    assert out[["x1", "x2"]].values.min() > 40.0
    assert out[["x1", "x2"]].values.max() < 50.0
    assert out[["y1", "y2"]].values.min() > 20.0
    assert out[["y1", "y2"]].values.max() < 30.0


def test_assemble_contour_lines_closed_ring(spark):
    """Single hot pixel -> ONE closed 4-segment ring (5 WKT points)."""
    from geomesa_spark.operators.contours import assemble_contour_lines
    out = _seg_df(spark, [(5.2, 7.3)] * 10, 4.5)
    lines = assemble_contour_lines(out)
    assert len(lines) == 1
    pts = lines[0][len("LINESTRING ("):-1].split(", ")
    assert len(pts) == 5 and pts[0] == pts[-1]


def test_assemble_contour_lines_blob(spark):
    """Interior blob: every assembled line is a closed ring and the total
    vertex count equals the segment count (degree-2 everywhere)."""
    import numpy as np
    from geomesa_spark.operators.contours import assemble_contour_lines
    rng = np.random.RandomState(7)
    pts = np.clip(rng.normal(8.0, 1.6, (4000, 2)), 0.05, 15.95)
    seg = _seg_df(spark, [tuple(p) for p in pts], 9.5)
    n_seg = seg.count()
    lines = assemble_contour_lines(seg)
    total_pts = 0
    for ln in lines:
        p = ln[len("LINESTRING ("):-1].split(", ")
        assert p[0] == p[-1]
        total_pts += len(p) - 1
    assert total_pts == n_seg
