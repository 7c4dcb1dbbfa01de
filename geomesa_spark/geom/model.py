"""Geometry object model backed by numpy coordinate arrays.

Types mirror the reference's attribute bindings (ObjectType.scala:25-26):
POINT, LINESTRING, POLYGON, MULTIPOINT, MULTILINESTRING, MULTIPOLYGON,
GEOMETRY_COLLECTION. Coordinates are (n, 2) float64 arrays; polygons are a
shell plus zero or more holes, each an implicitly-closed ring.

Predicate semantics follow JTS/OGC SFS (boundary points count as
intersecting; ``contains`` requires interior intersection), which is what the
reference's filters delegate to.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from geomesa_spark.geom import algos


def _coords(a) -> np.ndarray:
    arr = np.asarray(a, dtype=np.float64)
    if arr.ndim != 2 or arr.shape[1] != 2:
        raise ValueError(f"expected (n,2) coords, got {arr.shape}")
    return arr


class Geometry:
    """Base class; concrete types define coords/rings."""

    geom_type: str = "Geometry"

    # -- shared surface -------------------------------------------------------

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        xy = self._all_coords()
        if xy.size == 0:
            return (np.nan, np.nan, np.nan, np.nan)
        return (float(xy[:, 0].min()), float(xy[:, 1].min()),
                float(xy[:, 0].max()), float(xy[:, 1].max()))

    @property
    def is_empty(self) -> bool:
        return self._all_coords().size == 0

    def _all_coords(self) -> np.ndarray:
        raise NotImplementedError

    def _components(self) -> list["Geometry"]:
        """Flatten Multi*/collections into simple geometries."""
        return [self]

    # -- predicates (dispatch through algos) -----------------------------------

    def intersects(self, other: "Geometry") -> bool:
        return algos.intersects(self, other)

    def disjoint(self, other: "Geometry") -> bool:
        return not algos.intersects(self, other)

    def contains(self, other: "Geometry") -> bool:
        return algos.contains(self, other)

    def within(self, other: "Geometry") -> bool:
        return algos.contains(other, self)

    def covers(self, other: "Geometry") -> bool:
        return algos.covers(self, other)

    def crosses(self, other: "Geometry") -> bool:
        return algos.crosses(self, other)

    def touches(self, other: "Geometry") -> bool:
        return algos.touches(self, other)

    def overlaps(self, other: "Geometry") -> bool:
        return algos.overlaps(self, other)

    def equals(self, other: "Geometry") -> bool:
        return algos.geom_equals(self, other)

    def distance(self, other: "Geometry") -> float:
        return algos.distance(self, other)

    def centroid(self) -> "Point":
        return algos.centroid(self)

    @property
    def area(self) -> float:
        return algos.area(self)

    @property
    def length(self) -> float:
        return algos.length(self)

    def envelope(self) -> "Geometry":
        # JTS Geometry.getEnvelope shapes: point extent -> Point, zero-
        # width/height extent -> LineString, else the bounding Polygon
        xmin, ymin, xmax, ymax = self.bounds
        if xmin == xmax and ymin == ymax:
            return Point(xmin, ymin)
        if xmin == xmax or ymin == ymax:
            return LineString([[xmin, ymin], [xmax, ymax]])
        return Polygon([[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]])

    def __eq__(self, other):
        return isinstance(other, Geometry) and algos.geom_equals(self, other)

    def __hash__(self):
        return hash((self.geom_type, self._all_coords().tobytes()))

    def __repr__(self):
        from geomesa_spark.geom.wkt import wkt_dumps
        return wkt_dumps(self)


@dataclass(eq=False, repr=False)
class Point(Geometry):
    x: float
    y: float
    geom_type = "Point"

    def _all_coords(self) -> np.ndarray:
        if np.isnan(self.x):
            return np.empty((0, 2))
        return np.array([[self.x, self.y]])


@dataclass(eq=False, repr=False)
class LineString(Geometry):
    coords: np.ndarray
    geom_type = "LineString"

    def __post_init__(self):
        self.coords = _coords(self.coords)

    def _all_coords(self) -> np.ndarray:
        return self.coords

    @property
    def is_closed(self) -> bool:
        return len(self.coords) > 2 and bool(np.all(self.coords[0] == self.coords[-1]))


@dataclass(eq=False, repr=False)
class Polygon(Geometry):
    shell: np.ndarray
    holes: list[np.ndarray] = field(default_factory=list)
    geom_type = "Polygon"

    def __post_init__(self):
        self.shell = _close_ring(_coords(self.shell))
        self.holes = [_close_ring(_coords(h)) for h in self.holes]

    def _all_coords(self) -> np.ndarray:
        parts = [self.shell] + self.holes
        return np.vstack(parts) if parts else np.empty((0, 2))


def _close_ring(ring: np.ndarray) -> np.ndarray:
    if len(ring) and not np.all(ring[0] == ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    return ring


@dataclass(eq=False, repr=False)
class MultiPoint(Geometry):
    points: list[Point]
    geom_type = "MultiPoint"

    def _all_coords(self) -> np.ndarray:
        if not self.points:
            return np.empty((0, 2))
        return np.vstack([p._all_coords() for p in self.points])

    def _components(self):
        return list(self.points)


@dataclass(eq=False, repr=False)
class MultiLineString(Geometry):
    lines: list[LineString]
    geom_type = "MultiLineString"

    def _all_coords(self) -> np.ndarray:
        if not self.lines:
            return np.empty((0, 2))
        return np.vstack([l.coords for l in self.lines])

    def _components(self):
        return list(self.lines)


@dataclass(eq=False, repr=False)
class MultiPolygon(Geometry):
    polygons: list[Polygon]
    geom_type = "MultiPolygon"

    def _all_coords(self) -> np.ndarray:
        if not self.polygons:
            return np.empty((0, 2))
        return np.vstack([p._all_coords() for p in self.polygons])

    def _components(self):
        return list(self.polygons)


@dataclass(eq=False, repr=False)
class GeometryCollection(Geometry):
    geoms: list[Geometry]
    geom_type = "GeometryCollection"

    def _all_coords(self) -> np.ndarray:
        if not self.geoms:
            return np.empty((0, 2))
        return np.vstack([g._all_coords() for g in self.geoms])

    def _components(self):
        out = []
        for g in self.geoms:
            out.extend(g._components())
        return out


def box(xmin: float, ymin: float, xmax: float, ymax: float) -> Polygon:
    return Polygon([[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]])
