"""GeohashUtils.decomposeGeometry parity — the reference's own test
expectations (GeohashUtilsTest.scala `testData`: decomposition count AND
first hash per geometry) pinned against geom.gh_decompose, plus structural
properties and the Spark cover-predicate tie-in."""

import json
import os

import pytest

from geomesa_spark.geom.gh_decompose import (cell_bounds, cell_hash,
                                             cover_predicate,
                                             decompose_geometry,
                                             decompose_hashes, encode_cell)

GOLDENS = json.load(open(os.path.join(os.path.dirname(__file__), "data",
                                      "geohash_utils_goldens.json")))


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_reference_goldens(name):
    g = GOLDENS[name]
    hashes = decompose_hashes(g["wkt"], 100, (5, 40, 5))
    assert len(hashes) == g["n_cells"], name
    assert hashes[0] == g["first_hash"], name


def test_cells_are_disjoint():
    cells = decompose_geometry(GOLDENS["[POLYGON] Charlottesville"]["wkt"],
                               100, (5, 40, 5))
    # disjoint <=> no cell's bit-string is a prefix of another's
    for i, (b1, p1) in enumerate(cells):
        for b2, p2 in cells[i + 1:]:
            lo, hi = sorted(((b1, p1), (b2, p2)), key=lambda c: c[1])
            assert lo[0] != (hi[0] >> (hi[1] - lo[1])), "overlapping cells"


def test_cells_cover_target_points():
    from geomesa_spark.geom.wkt import wkt_loads
    from geomesa_spark.geom.gh_decompose import _point_in_poly
    wkt = GOLDENS["[POLYGON] Charlottesville"]["wkt"]
    poly = wkt_loads(wkt)
    cells = decompose_geometry(wkt, 100, (5, 40, 5))
    bounds = [cell_bounds(b, p) for b, p in cells]
    cs = poly.shell
    xmin, ymin = float(cs[:, 0].min()), float(cs[:, 1].min())
    xmax, ymax = float(cs[:, 0].max()), float(cs[:, 1].max())
    checked = 0
    for i in range(400):
        x = xmin + (xmax - xmin) * ((i * 37 % 97) / 97.0)
        y = ymin + (ymax - ymin) * ((i * 61 % 89) / 89.0)
        if not _point_in_poly(x, y, poly):
            continue
        checked += 1
        assert any(bx0 <= x <= bx1 and by0 <= y <= by1
                   for bx0, by0, bx1, by1 in bounds), (x, y)
    assert checked > 50


def test_partial_character_hash_padding():
    # 13-bit cell -> 3 chars with the trailing 2 bits zero-padded,
    # matching GeoHash.hash's whole-character rendering
    bits, prec = encode_cell(-78.5, 38.03, 13)
    h = cell_hash(bits, prec)
    assert len(h) == 3
    full = encode_cell(-78.5, 38.03, 15)
    assert cell_hash(*full)[:2] == h[:2]


def test_cover_predicate_selects_exactly_cell_members(spark):
    from pyspark.sql import functions as F
    from geomesa_spark.functions import geohash as gh
    wkt = GOLDENS["[POLYGON] Charlottesville"]["wkt"]
    cells = decompose_geometry(wkt, 100, (5, 40, 5))
    bounds = [cell_bounds(b, p) for b, p in cells]
    # points on a grid spanning the area, each with its 40-bit hash string
    rows = []
    for i in range(40):
        for j in range(40):
            x = -78.56 + 0.2 * i / 39
            y = 37.95 + 0.2 * j / 39
            rows.append((i * 40 + j, x, y, gh.encode(x, y, 40)))
    df = spark.createDataFrame(rows, "id long, x double, y double, gh string")
    got = {r.id for r in df.where(cover_predicate("gh", cells)).collect()}
    want = {rid for rid, x, y, _ in rows
            if any(bx0 <= x <= bx1 and by0 <= y <= by1
                   for bx0, by0, bx1, by1 in bounds)}
    # boundary-snapped points can differ (a point ON a shared cell edge
    # hashes into exactly one cell); compare away from boundaries
    eps = 1e-9
    interior = {rid for rid, x, y, _ in rows
                if any(bx0 + eps < x < bx1 - eps and by0 + eps < y < by1 - eps
                       for bx0, by0, bx1, by1 in bounds)}
    assert interior <= got <= want
    assert len(got) > 100


SUBSTRING_GOLDENS = [((0, 2), 3), ((2, 3), 9), ((0, 3), 4),
                     ((3, 2), 8), ((0, 6), 83), ((0, 7), 1762)]


@pytest.mark.parametrize("params,want", SUBSTRING_GOLDENS)
def test_unique_substring_reference_goldens(params, want):
    """GeohashUtilsTest 'getUniqueGeohashSubstringsInPolygon' expectations
    (all six (offset, length) cases over the Charlottesville polygon)."""
    from geomesa_spark.geom.gh_decompose import unique_geohash_substrings
    wkt = GOLDENS["[POLYGON] Charlottesville"]["wkt"]
    got = unique_geohash_substrings(wkt, *params)
    assert len(got) == want


def test_unique_substrings_undotted_are_prefix_consistent():
    from geomesa_spark.geom.gh_decompose import unique_geohash_substrings
    wkt = GOLDENS["[POLYGON] Charlottesville"]["wkt"]
    dotted = unique_geohash_substrings(wkt, 0, 3)
    undotted = unique_geohash_substrings(wkt, 0, 3, include_dots=False)
    # every dotted entry is a dot-padded prefix of some undotted hash
    for d in dotted:
        stem = d.rstrip(".")
        assert any(h.startswith(stem) for h in undotted), d
    # the full-length entries of the dotted set ARE the undotted set
    assert sorted(d for d in dotted if "." not in d) == sorted(undotted)
