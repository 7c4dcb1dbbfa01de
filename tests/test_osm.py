"""OSM converter: node/way parse + distributed way assembly
(reference: geomesa-convert-osm OsmNodesConverter / OsmWaysConverter)."""

from __future__ import annotations

import textwrap

import pytest

from geomesa_spark.sources.osm import assemble_way_geoms, read_osm_xml

OSM_DOC = textwrap.dedent("""\
    <?xml version='1.0' encoding='UTF-8'?>
    <osm version="0.6" generator="test">
      <node id="1" lat="51.5" lon="-0.1" version="2" timestamp="2024-01-01T00:00:00Z">
        <tag k="amenity" v="cafe"/>
        <tag k="name" v="Test Cafe"/>
      </node>
      <node id="2" lat="51.6" lon="-0.2" version="1"/>
      <node id="3" lat="51.7" lon="-0.3" version="1"/>
      <way id="10" version="3" timestamp="2024-02-02T00:00:00Z">
        <nd ref="1"/><nd ref="2"/><nd ref="3"/>
        <tag k="highway" v="residential"/>
      </way>
      <way id="11" version="1">
        <nd ref="2"/><nd ref="999"/><nd ref="3"/>
      </way>
      <way id="12" version="1">
        <nd ref="999"/><nd ref="1"/>
      </way>
    </osm>
""")


@pytest.fixture()
def osm_dir(tmp_path):
    p = tmp_path / "extract.osm"
    p.write_text(OSM_DOC)
    return str(tmp_path)


def test_read_nodes(spark, osm_dir):
    nodes = read_osm_xml(spark, osm_dir, "node").orderBy("id").collect()
    assert [n.id for n in nodes] == [1, 2, 3]
    assert nodes[0].lon == -0.1 and nodes[0].lat == 51.5
    assert nodes[0].tags == {"amenity": "cafe", "name": "Test Cafe"}
    assert nodes[0].version == 2
    assert nodes[1].tags == {}


def test_read_ways(spark, osm_dir):
    ways = read_osm_xml(spark, osm_dir, "way").orderBy("id").collect()
    assert [w.id for w in ways] == [10, 11, 12]
    assert ways[0].refs == [1, 2, 3]
    assert ways[0].tags == {"highway": "residential"}


def test_assemble_way_geoms(spark, osm_dir):
    nodes = read_osm_xml(spark, osm_dir, "node")
    ways = read_osm_xml(spark, osm_dir, "way")
    out = {r.id: r for r in assemble_way_geoms(nodes, ways).collect()}
    assert out[10].wkt == ("LINESTRING (-0.1000000 51.5000000, "
                           "-0.2000000 51.6000000, -0.3000000 51.7000000)")
    assert out[10].n_missing == 0
    # clipped extract: missing ref dropped, counted
    assert out[11].wkt == ("LINESTRING (-0.2000000 51.6000000, "
                           "-0.3000000 51.7000000)")
    assert out[11].n_missing == 1
    # a way with < 2 resolved vertices yields NULL geometry
    assert out[12].wkt is None and out[12].n_missing == 1


def test_assemble_broadcast_path(spark, osm_dir):
    nodes = read_osm_xml(spark, osm_dir, "node")
    ways = read_osm_xml(spark, osm_dir, "way")
    a = {(r.id, r.wkt) for r in
         assemble_way_geoms(nodes, ways, broadcast_nodes=True).collect()}
    b = {(r.id, r.wkt) for r in assemble_way_geoms(nodes, ways).collect()}
    assert a == b


def test_infer_jdbc_gate(spark):
    """No JDBC driver in the sandbox: the converter raises a descriptive
    error, not a bare ClassNotFound stack."""
    from geomesa_spark.sources.ingest import infer_jdbc
    with pytest.raises(RuntimeError, match="jdbc driver unavailable"):
        infer_jdbc(spark, "jdbc:postgresql://localhost/db", "features")


def test_assemble_empty_refs_way_surfaces(spark):
    """A way with NO nd refs still appears (null wkt, n_missing=0) —
    lenient-mode reporting, not a silent drop (posexplode_outer path)."""
    nodes = spark.createDataFrame(
        [(1, -0.1, 51.5)], "id long, lon double, lat double")
    ways = spark.createDataFrame(
        [(20, {"highway": "road"}, [1]), (21, {}, [])],
        "id long, tags map<string,string>, refs array<long>")
    out = {r.id: r for r in assemble_way_geoms(nodes, ways).collect()}
    assert set(out) == {20, 21}
    assert out[21].wkt is None
    assert out[21].n_missing == 0
