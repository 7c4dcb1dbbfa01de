"""Geometry layer: pure numpy WKB/WKT codecs and vectorized predicate kernels.

There is no shapely/GEOS in the target environment, so the engine carries its
own geometry model. Two tiers:

* Hot paths (indexing, PIP join, kNN, tiling) operate on plain ``lon``/``lat``
  double columns and never parse WKB — those stay in native Catalyst
  expressions / whole-stage codegen.
* The generic ST_* function surface parses WKB in Arrow-batched pandas UDFs
  using this package: geometry types mirror the reference's supported set
  (Point, LineString, Polygon, Multi*, GeometryCollection —
  ObjectType.scala:25-26,78-86), predicates mirror the JTS semantics used by
  the reference's filter dispatch (geomesa-filter package.scala:268-277).
"""

from geomesa_spark.geom.model import (  # noqa: F401
    Geometry, Point, MultiPoint, LineString, MultiLineString, Polygon,
    MultiPolygon, GeometryCollection,
)
from geomesa_spark.geom.wkb import wkb_dumps, wkb_loads  # noqa: F401
from geomesa_spark.geom.wkt import wkt_dumps, wkt_loads  # noqa: F401
