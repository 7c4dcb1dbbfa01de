"""OSM ingest: nodes, ways, and distributed way-geometry assembly.

The reference ships an OSM converter module (geomesa-convert-osm —
OsmNodesConverter.scala / OsmWaysConverter.scala) that reads OSM XML/PBF
and emits node points or way linestrings.  PBF needs protobuf (absent in
this container, honestly gated); OSM XML rides the engine's executor-side
XML machinery (sources/ingest.read_xml shape).

The Spark-first part is the WAY ASSEMBLY: the reference resolves each
way's node refs against an in-memory/mapdb node cache (OsmWaysConverter);
at 100 TB that becomes a distributed join — posexplode the ref list,
broadcast-or-shuffle join against the node table on id, re-assemble in
ref order with collect_list over a window.  One shuffle per side, no
driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NODE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("lon", T.DoubleType()),
    T.StructField("lat", T.DoubleType()),
    T.StructField("version", T.IntegerType()),
    T.StructField("timestamp", T.StringType()),
    T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
])

_WAY_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("refs", T.ArrayType(T.LongType())),
    T.StructField("version", T.IntegerType()),
    T.StructField("timestamp", T.StringType()),
    T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
])


def read_osm_xml(spark: SparkSession, path: str,
                 element: str = "node") -> DataFrame:
    """Parse OSM XML files into nodes (``element='node'``: id, lon, lat,
    version, timestamp, tags) or ways (``element='way'``: id, refs,
    version, timestamp, tags).

    Executor-side parse: ``binaryFile`` -> ``mapInPandas`` over whole
    documents (one task per file, scales with the file count — OSM
    extracts ship as many regional files).  PBF is not supported here
    (protobuf unavailable); convert with osmium first.
    """
    if element not in ("node", "way"):
        raise ValueError("element must be 'node' or 'way'")
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path).select("content")
    schema = _NODE_SCHEMA if element == "node" else _WAY_SCHEMA

    def parse(batches):
        import xml.etree.ElementTree as ET
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                root = ET.fromstring(bytes(blob))
                for el in root.iter(element):
                    tags = {t.get("k"): t.get("v") for t in el.findall("tag")}
                    base = {
                        "id": int(el.get("id")),
                        "version": int(el.get("version", "0") or 0),
                        "timestamp": el.get("timestamp"),
                        "tags": tags,
                    }
                    if element == "node":
                        base["lon"] = float(el.get("lon"))
                        base["lat"] = float(el.get("lat"))
                    else:
                        base["refs"] = [int(nd.get("ref"))
                                        for nd in el.findall("nd")]
                    rows.append(base)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return raw.mapInPandas(parse, schema=schema)


def assemble_way_geoms(nodes: DataFrame, ways: DataFrame, *,
                       broadcast_nodes: bool = False) -> DataFrame:
    """(id, tags, wkt, n_missing) linestrings from ways + node table.

    Distributed ref resolution (the OsmWaysConverter node-cache join at
    cluster scale): posexplode refs -> join nodes on id -> window-ordered
    re-assembly.  ``broadcast_nodes`` for small extracts; default is a
    shuffle join keyed on node id (both sides hash-partition, no skew —
    node ids are dense sequential).

    Ways with missing nodes (clipped extracts) keep their remaining
    vertices and report ``n_missing`` — the converter's lenient mode.
    Ways with an EMPTY refs array still surface (null wkt, n_missing=0)
    via posexplode_outer, consistent with lenient reporting.
    """
    refs = ways.select("id", "tags", F.posexplode_outer("refs")
                       .alias("seq", "ref"))
    node_pts = nodes.select(F.col("id").alias("ref"), "lon", "lat")
    if broadcast_nodes:
        node_pts = F.broadcast(node_pts)
    joined = refs.join(node_pts, "ref", "left")
    pts = (joined
           .groupBy("id")
           .agg(F.first("tags").alias("tags"),
                F.sum(F.when(F.col("ref").isNotNull()
                             & F.col("lon").isNull(), 1).otherwise(0))
                .alias("n_missing"),
                F.array_sort(F.collect_list(F.when(
                    F.col("lon").isNotNull(),
                    F.struct("seq", "lon", "lat")))).alias("vs")))
    coord = ("concat(format_string('%.7f', v.lon), ' ', "
             "format_string('%.7f', v.lat))")
    wkt = F.when(
        F.size("vs") >= 2,
        F.concat(F.lit("LINESTRING ("),
                 F.expr(f"array_join(transform(vs, v -> {coord}), ', ')"),
                 F.lit(")")))
    return pts.select("id", "tags", wkt.alias("wkt"),
                      F.col("n_missing").cast("int").alias("n_missing"))
