"""Geo export sinks: GeoJSON / GML / Leaflet / Shapefile round-trips
(ExportFormat.scala:51-113 long tail)."""

import json
import struct

import pytest

from geomesa_spark.sources import export
from geomesa_spark.sources.testdata import geo_events


@pytest.fixture(scope="module")
def geo(spark, sf_dir):
    return geo_events(spark, sf_dir).where("event_id < 50").cache()


def test_geojson_features_parse(geo):
    rows = export.to_geojson_features(geo).select("feature").collect()
    assert len(rows) > 0
    for r in rows[:5]:
        f = json.loads(r.feature)
        assert f["type"] == "Feature"
        assert f["geometry"]["type"] == "Point"
        lon, lat = f["geometry"]["coordinates"]
        assert -180 <= lon <= 180 and -90 <= lat <= 90
        assert "event_type" in f["properties"]


def test_write_geojson_collections(geo, tmp_path):
    path = str(tmp_path / "gj")
    export.write_geojson(geo.coalesce(2), path)
    import glob
    parts = sorted(glob.glob(path + "/part-*"))
    assert parts
    total = 0
    for p in parts:
        with open(p) as fh:
            doc = json.loads(fh.read())
        assert doc["type"] == "FeatureCollection"
        total += len(doc["features"])
    assert total == geo.count()


def test_gml_fragments_well_formed(geo, tmp_path):
    import xml.etree.ElementTree as ET
    path = str(tmp_path / "out.gml")
    export.write_gml(geo, path)
    tree = ET.parse(path)  # raises on malformed XML
    ns = {"gml": "http://www.opengis.net/gml/3.2"}
    members = tree.getroot().findall("gml:featureMember", ns)
    assert len(members) == geo.count()
    pos = members[0].find(".//gml:pos", ns).text
    lat, lon = map(float, pos.split())
    assert -90 <= lat <= 90 and -180 <= lon <= 180


def test_leaflet_page(geo, tmp_path):
    path = str(tmp_path / "map.html")
    export.write_leaflet(geo, path, max_features=10)
    html = open(path).read()
    assert "L.geoJSON" in html
    start = html.index('{"type":"FeatureCollection"')
    end = html.index(";\nvar layer")
    doc = json.loads(html[start:end])
    assert len(doc["features"]) == 10


def test_shapefile_binary_structure(geo, tmp_path):
    base = str(tmp_path / "layer")
    export.write_shapefile(geo.select("event_id", "event_type", "lon", "lat"),
                           base)
    n = geo.count()
    shp = open(base + ".shp", "rb").read()
    assert struct.unpack(">i", shp[:4])[0] == 9994          # magic
    assert struct.unpack("<i", shp[28:32])[0] == 1000       # version
    assert struct.unpack("<i", shp[32:36])[0] == 1          # point type
    # declared length (16-bit words) matches the file
    assert struct.unpack(">i", shp[24:28])[0] * 2 == len(shp)
    # first record: shape type 1 + lon/lat doubles
    t, x, y = struct.unpack("<idd", shp[108:128])
    assert t == 1 and -180 <= x <= 180 and -90 <= y <= 90
    shx = open(base + ".shx", "rb").read()
    assert len(shx) == 100 + n * 8
    dbf = open(base + ".dbf", "rb").read()
    n_rec = struct.unpack("<I", dbf[4:8])[0]
    assert n_rec == n
    assert dbf[0] == 3 and dbf[-1] == 0x1A


def test_gml2_variant(geo):
    frag = (export.to_gml_features(geo.limit(1), version=2)
            .select("gml").collect()[0].gml)
    assert "gml:coordinates" in frag and "epsg.xml#4326" in frag
    lonlat = frag.split("<gml:coordinates>")[1].split("</gml:coordinates>")[0]
    lon, lat = map(float, lonlat.split(","))
    assert -180 <= lon <= 180 and -90 <= lat <= 90


def test_gml_bounded_by_max_features(geo, tmp_path):
    """write_gml must bound its driver collect like its siblings."""
    path = str(tmp_path / "bounded.gml")
    export.write_gml(geo, path, max_features=3)
    text = open(path).read()
    assert text.count("<gml:featureMember>") == 3


class TestBinPacked:
    """BIN byte-layout parity (utils/bin/BinaryOutputEncoder.scala:
    120-190): little-endian int32 track / int32 secs / float32 lat /
    float32 lon (+ int64 label), decoded with the exact ByteBuffer
    layout."""

    def test_pack_decode_roundtrip(self, spark):
        import struct

        import numpy as np
        import pandas as pd

        from geomesa_spark.sources.export import bin_pack, decode_bin
        pdf = pd.DataFrame({
            "track": [1, 2, 3, 2**31 + 5],   # last wraps like (int) cast
            "ts": pd.to_datetime([1600000000, 1600000001, 1600000002,
                                  1600000003], unit="s"),
            "lat": [38.5, -12.25, 0.0, 89.9],
            "lon": [-76.5, 44.125, 180.0, -179.9]})
        df = spark.createDataFrame(pdf)
        chunks = bin_pack(df, "track", "ts", "lat", "lon").collect()
        assert sum(c.n_records for c in chunks) == 4
        recs = np.concatenate(
            [decode_bin(bytes(c.bytes)) for c in chunks])
        got = {int(r["track"]): r for r in recs}
        # JVM (int) cast wraps 2^31+5 -> -2^31+5
        assert -(2**31) + 5 in got
        r = got[1]
        assert int(r["secs"]) == 1600000000
        assert abs(float(r["lat"]) - 38.5) < 1e-6
        assert abs(float(r["lon"]) - -76.5) < 1e-6
        # byte-level check of one record against struct.pack
        one = bin_pack(df.where("track = 1"), "track", "ts", "lat",
                       "lon").collect()[0]
        assert bytes(one.bytes) == struct.pack(
            "<iiff", 1, 1600000000, 38.5, -76.5)

    def test_label_fold_scala_parity(self, spark):
        import pandas as pd

        from geomesa_spark.sources.export import bin_pack, decode_bin
        pdf = pd.DataFrame({
            "track": [1, 2, 3],
            "ts": pd.to_datetime([0, 0, 0], unit="s"),
            "lat": [0.0, 0.0, 0.0], "lon": [0.0, 0.0, 0.0],
            "label": ["ab", None, "12345678_truncated"]})
        df = spark.createDataFrame(pdf)
        recs = {int(r["track"]): r for c in bin_pack(
            df, "track", "ts", "lat", "lon", label_col="label").collect()
            for r in decode_bin(bytes(c.bytes), has_label=True)}
        # scala convertToLabel: sum of first 8 utf-8 bytes shifted LE
        assert int(recs[1]["label"]) == ord("a") + (ord("b") << 8)
        assert int(recs[2]["label"]) == 0
        want = 0
        for i, b in enumerate(b"12345678"):
            want += b << (8 * i)
        assert int(recs[3]["label"]) == want

    def test_track_string_hash_and_nulls(self, spark):
        """convertToTrack semantics: string track ids hash (Java
        String.hashCode over code units), null track/ts become 0 —
        instead of a to_numpy(int64) crash on NULLs."""
        import pandas as pd

        from geomesa_spark.sources.export import bin_pack, decode_bin
        pdf = pd.DataFrame({
            "track": ["alpha", None, "z"],
            "ts": [pd.Timestamp(1600000000, unit="s"), pd.NaT,
                   pd.Timestamp(1600000002, unit="s")],
            "lat": [1.0, 2.0, 3.0], "lon": [4.0, 5.0, 6.0]})
        df = spark.createDataFrame(pdf)
        recs = []
        for c in bin_pack(df, "track", "ts", "lat", "lon").collect():
            recs.extend(decode_bin(bytes(c.bytes)))
        def jhash(s):
            h = 0
            for ch in s:
                h = (h * 31 + ord(ch)) % (1 << 32)
            return h - (1 << 32) if h >= (1 << 31) else h
        got = {int(r["track"]): int(r["secs"]) for r in recs}
        assert got[jhash("alpha")] == 1600000000
        assert got[jhash("z")] == 1600000002
        assert got[0] == 0  # null track + null ts -> zeros
