"""Span-cover planning + rollup tile pyramid (round-3 scale fixes).

The broadcast PIP join's cover is O(perimeter) scanline spans
(plans/cover.cover_spans) instead of O(area) cells, and tile_pyramid rolls
coarser zooms up from the finest level instead of exploding every input row
per zoom. Both must be exactly equivalent to the cell/explode semantics —
these tests pin that equivalence (reference semantics: RelationUtils.grid
join candidates; DensityScan/GridSnap pixel math).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from geomesa_spark.geom import algos, wkt
from geomesa_spark.plans.cover import (classify_cell_cover_xy, cover_spans,
                                       pick_span_resolution)


def _circle(cx, cy, r, n=16):
    pts = [(cx + r * math.cos(2 * math.pi * i / n),
            cy + r * math.sin(2 * math.pi * i / n)) for i in range(n)]
    pts.append(pts[0])
    return "POLYGON ((" + ", ".join(f"{x:.6f} {y:.6f}" for x, y in pts) + "))"


CASES = [
    _circle(10, 20, 8),
    _circle(-170, 0, 15),          # clamps at the antimeridian edge
    "POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0), (10 10, 30 10, 30 30, 10 10))",
    "POLYGON ((-60 -60, -20 -60, -20 -20, -40 -40, -60 -20, -60 -60))",
    "MULTIPOLYGON (((100 10, 120 10, 120 30, 100 30, 100 10)), "
    "((130 -20, 150 -20, 150 0, 130 0, 130 -20)))",
    "POLYGON ((0 0, 0.01 0, 0.01 0.01, 0 0.01, 0 0))",   # sub-cell polygon
]


@pytest.mark.parametrize("wkt_str", CASES)
@pytest.mark.parametrize("res", [6, 8])
def test_spans_equal_cell_cover(wkt_str, res):
    """Span cover expands to exactly the classify_cell_cover_xy cell sets,
    with the same interior/boundary split."""
    g = wkt.wkt_loads(wkt_str)
    contained_xy, boundary_xy = classify_cell_cover_xy(g, res)
    want_int = {(int(x), int(y)) for x, y in contained_xy}
    want_bnd = {(int(x), int(y)) for x, y in boundary_xy}

    iy, x0, x1, interior = cover_spans(g, res)
    got_int, got_bnd = set(), set()
    for yy, a, b, it in zip(iy, x0, x1, interior):
        for xx in range(int(a), int(b) + 1):
            (got_int if it else got_bnd).add((xx, int(yy)))

    assert got_bnd == want_bnd
    # interior spans must be a superset of the corner-test interior (the
    # corner variant can under-classify corner-touching cells as neither)
    # and must never include a boundary cell or an outside cell
    assert got_int >= want_int
    assert not (got_int & want_bnd)
    extra = got_int - want_int
    for xx, yy in extra:
        n = 1 << res
        cx = -180.0 + (xx + 0.5) * 360.0 / n
        cy = -90.0 + (yy + 0.5) * 180.0 / n
        assert algos.points_intersect(np.array([cx]), np.array([cy]), g)[0]


def test_spans_are_disjoint_per_polygon():
    g = wkt.wkt_loads(CASES[0])
    iy, x0, x1, _ = cover_spans(g, 8)
    seen = set()
    for yy, a, b in zip(iy, x0, x1):
        for xx in range(int(a), int(b) + 1):
            assert (xx, yy) not in seen
            seen.add((xx, yy))


def test_span_count_is_perimeter_scaled():
    """O(perimeter): refining by 2x roughly doubles spans (cells quadruple)."""
    g = wkt.wkt_loads(_circle(0, 0, 20, n=64))
    n8 = len(cover_spans(g, 8)[0])
    n10 = len(cover_spans(g, 10)[0])
    cells10 = sum(len(a) for a in classify_cell_cover_xy(g, 10))
    assert n10 < 6 * n8          # linear-ish growth, not 16x
    assert n10 < cells10 / 4     # far fewer spans than cells


def test_pick_span_resolution_row_budget():
    res = pick_span_resolution([(-10, -10, 10, 10)], target_rows=512)
    rows = 20.0 / (180.0 / (1 << res))
    assert rows <= 512
    assert 20.0 / (180.0 / (1 << (res + 1))) > 512


def test_pip_join_broadcast_spans_match_bruteforce(spark):
    """End-to-end: span-join results == vectorized brute force, including a
    holed polygon, a concave polygon and a multipolygon."""
    from geomesa_spark.operators.pip_join import pip_join_broadcast
    polys = [("c", _circle(12, -33, 9)), ("hole", CASES[2]),
             ("concave", CASES[3]), ("multi", CASES[4])]
    rng = np.random.RandomState(11)
    n = 30_000
    lons = rng.uniform(-180, 180, n)
    lats = rng.uniform(-90, 90, n)
    pdf = pd.DataFrame({"id": np.arange(n), "lon": lons, "lat": lats})
    got = (pip_join_broadcast(spark.createDataFrame(pdf), polys)
           .select("id", "poly_id").toPandas())
    got_set = set(zip(got["id"], got["poly_id"]))
    want = set()
    for pid, w in polys:
        m = algos.points_intersect(lons, lats, wkt.wkt_loads(w))
        want.update((i, pid) for i in np.nonzero(m)[0])
    assert got_set == want


def test_tile_pyramid_rollup_matches_naive(spark):
    """Rollup levels == per-zoom recompute from the raw rows (keys exactly,
    weights to 1e-9), including the +90/+180 clamped edge."""
    from geomesa_spark.operators.tiling import tile_pyramid
    rng = np.random.RandomState(3)
    n = 20_000
    pdf = pd.DataFrame({"lon": rng.uniform(-180, 180, n),
                        "lat": rng.uniform(-90, 90, n),
                        "w": rng.uniform(0.0, 2.0, n)})
    pdf.loc[0, ["lon", "lat"]] = [180.0, 90.0]
    pdf.loc[1, ["lon", "lat"]] = [-180.0, -90.0]
    got = tile_pyramid(spark.createDataFrame(pdf), [1, 3, 6], tile_px=64,
                       weight="w").toPandas()
    lon, lat, w = (pdf[c].to_numpy() for c in ("lon", "lat", "w"))
    acc: dict = {}
    for z in (1, 3, 6):
        npx = (1 << z) * 64
        gx = np.minimum(np.floor((lon + 180.0) / 360.0 * npx), npx - 1).astype(np.int64)
        gy = np.minimum(np.floor((lat + 90.0) / 180.0 * npx), npx - 1).astype(np.int64)
        for i in range(n):
            k = (z, gx[i] // 64, gy[i] // 64, gx[i] % 64, gy[i] % 64)
            s = acc.setdefault(k, [0.0, 0])
            s[0] += w[i]
            s[1] += 1
    gm = {(r.zoom, r.tx, r.ty, r.px, r.py): (r.weight, r.cnt)
          for r in got.itertuples()}
    assert set(gm) == set(acc)
    for k, (ws, c) in acc.items():
        assert gm[k][1] == c
        assert abs(gm[k][0] - ws) < 1e-9


def test_tile_pyramid_single_zoom_and_dupes(spark):
    from geomesa_spark.operators.tiling import tile_pyramid
    df = spark.createDataFrame(
        pd.DataFrame({"lon": [0.0, 0.0, 100.0], "lat": [0.0, 0.0, 45.0]}))
    out = tile_pyramid(df, [2, 2], tile_px=256).toPandas()
    assert (out["zoom"] == 2).all()
    assert int(out["cnt"].sum()) == 3


def test_render_tile_images_roundtrip(spark):
    """Tile blobs decode back to the exact floor-scaled weights (lossless
    fmt), north-up orientation, one blob per tile."""
    import numpy as np
    import pandas as pd

    from geomesa_spark.operators.tiling import (render_tile_images,
                                                tile_pyramid)
    from geomesa_spark.sources.images import decode_image

    rng = np.random.RandomState(5)
    pdf = pd.DataFrame({"lon": rng.uniform(-180, 180, 5000),
                        "lat": rng.uniform(-90, 90, 5000)})
    tiles = tile_pyramid(spark.createDataFrame(pdf), [2], tile_px=64)
    blobs = render_tile_images(tiles, tile_px=64, value_col="cnt").collect()
    want = tiles.toPandas()
    by_tile = {(r.zoom, r.tx, r.ty): r for r in blobs}
    assert len(blobs) == len(want.groupby(["zoom", "tx", "ty"]))
    for (z, tx, ty), grp in want.groupby(["zoom", "tx", "ty"]):
        r = by_tile[(z, tx, ty)]
        px = decode_image(bytes(r.bytes))
        assert px.shape == (64, 64, 3)
        arr = np.zeros((64, 64))
        arr[63 - grp["py"].to_numpy(), grp["px"].to_numpy()] = \
            grp["cnt"].to_numpy()
        vmax = arr.max()
        expect = np.floor(arr / vmax * 255.0).astype(np.uint8)
        assert (px[:, :, 0] == expect).all()
        assert (px[:, :, 0] == px[:, :, 1]).all()
        assert abs(r.vmax - vmax) < 1e-12


def test_span_join_is_broadcast_hash_join(spark):
    """Plan shape: the span cover joins as a BroadcastHashJoin on the grid
    row (equi-key) with the x-range check as a join filter — NOT a
    BroadcastNestedLoopJoin, which would probe every span per point."""
    from geomesa_spark.operators.pip_join import pip_join_broadcast
    pdf = pd.DataFrame({"lon": [10.0, 20.0], "lat": [5.0, -5.0]})
    out = pip_join_broadcast(spark.createDataFrame(pdf),
                             [("c", _circle(10, 5, 8))])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
