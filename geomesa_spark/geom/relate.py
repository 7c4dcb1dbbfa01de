"""DE-9IM relate matrix + geometry difference.

Engine analog of the reference's ST_Relate / ST_RelateBool / ST_Difference
(geomesa-spark-jts udf/SpatialRelationFunctions.scala:38-39,59, which
delegate to JTS RelateOp / OverlayOp).  JTS computes the matrix from a full
topology graph; this implementation uses explicit feature decomposition,
which is exact for the same inputs without the graph machinery:

1. split every 1-D feature (line segments, polygon ring segments) of each
   geometry at its intersection points with the other geometry's segments
   and vertices — after splitting, every sub-segment lies entirely inside
   one location class (interior/boundary/exterior) of the other geometry;
2. classify representative samples: vertices and split points (dim 0),
   sub-segment midpoints (dim 1), and near-boundary offset points on both
   sides of every sub-segment (dim 2, for polygon interiors);
3. each sample raises one matrix cell to at least its feature dimension;
   exterior x exterior is always 2 for bounded geometries.

The boundary of lines follows the SFS mod-2 rule (endpoints occurring an
odd number of times across components are boundary points).
"""

from __future__ import annotations

import numpy as np

from geomesa_spark.geom import algos, model

# matrix indices
I, B, E = 0, 1, 2
_F = -1  # empty cell


# ---------------------------------------------------------------------------
# segment intersection points (incl. collinear overlaps)
# ---------------------------------------------------------------------------

def _seg_points(p1, p2, q1, q2) -> list[tuple[float, float]]:
    """All points where closed segment p meets closed segment q: 0 points,
    1 (crossing / endpoint touch), or 2 (collinear overlap endpoints)."""
    o1 = algos._orient(*p1, *p2, *q1)
    o2 = algos._orient(*p1, *p2, *q2)
    o3 = algos._orient(*q1, *q2, *p1)
    o4 = algos._orient(*q1, *q2, *p2)
    if o1 == 0 and o2 == 0 and o3 == 0 and o4 == 0:
        # collinear: overlap interval endpoints via projection on the
        # dominant axis
        ax = 0 if abs(p2[0] - p1[0]) >= abs(p2[1] - p1[1]) else 1
        lo_p, hi_p = sorted([p1[ax], p2[ax]])
        lo_q, hi_q = sorted([q1[ax], q2[ax]])
        lo, hi = max(lo_p, lo_q), min(hi_p, hi_q)
        if lo > hi:
            return []
        pts = []
        for t in {lo, hi}:
            for s in (p1, p2, q1, q2):
                if s[ax] == t:
                    pts.append((float(s[0]), float(s[1])))
                    break
        return pts
    if ((o1 > 0) != (o2 > 0)) and ((o3 > 0) != (o4 > 0)) \
            and o1 != 0 and o2 != 0 and o3 != 0 and o4 != 0:
        # proper crossing: solve
        d = (p2[0] - p1[0]) * (q2[1] - q1[1]) - (p2[1] - p1[1]) * (q2[0] - q1[0])
        t = ((q1[0] - p1[0]) * (q2[1] - q1[1]) - (q1[1] - p1[1]) * (q2[0] - q1[0])) / d
        return [(float(p1[0] + t * (p2[0] - p1[0])),
                 float(p1[1] + t * (p2[1] - p1[1])))]
    out = []
    if o1 == 0 and algos._on_segment(*q1, *p1, *p2):
        out.append((float(q1[0]), float(q1[1])))
    if o2 == 0 and algos._on_segment(*q2, *p1, *p2):
        out.append((float(q2[0]), float(q2[1])))
    if o3 == 0 and algos._on_segment(*p1, *q1, *q2):
        out.append((float(p1[0]), float(p1[1])))
    if o4 == 0 and algos._on_segment(*p2, *q1, *q2):
        out.append((float(p2[0]), float(p2[1])))
    return list(dict.fromkeys(out))


def _all_segments(geom) -> list[tuple]:
    segs = []
    for c in geom._components():
        if isinstance(c, model.LineString):
            segs.extend((tuple(a), tuple(b)) for a, b in algos._segs(c.coords))
        elif isinstance(c, model.Polygon):
            for ring in algos._rings(c):
                segs.extend((tuple(a), tuple(b)) for a, b in algos._segs(ring))
    return segs


def _all_vertices(geom) -> list[tuple[float, float]]:
    pts = geom._all_coords()
    return [(float(x), float(y)) for x, y in pts]


def _split_segment(p1, p2, cuts) -> list[tuple]:
    """Sub-segments of (p1, p2) split at every cut point lying on it."""
    ax = 0 if abs(p2[0] - p1[0]) >= abs(p2[1] - p1[1]) else 1
    span = p2[ax] - p1[ax]
    ts = {0.0, 1.0}
    for (cx, cy) in cuts:
        if algos._orient(*p1, *p2, cx, cy) == 0 and algos._on_segment(cx, cy, *p1, *p2):
            if span != 0:
                ts.add(((cx, cy)[ax] - p1[ax]) / span)
    order = sorted(ts)
    subs = []
    for t0, t1 in zip(order, order[1:]):
        if t1 > t0:
            a = (p1[0] + t0 * (p2[0] - p1[0]), p1[1] + t0 * (p2[1] - p1[1]))
            b = (p1[0] + t1 * (p2[0] - p1[0]), p1[1] + t1 * (p2[1] - p1[1]))
            subs.append((a, b))
    return subs


# ---------------------------------------------------------------------------
# point location with local dimension
# ---------------------------------------------------------------------------

def _line_boundary_points(geom) -> set[tuple[float, float]]:
    """SFS mod-2 boundary: line endpoints occurring an odd number of times."""
    count: dict[tuple, int] = {}
    for c in geom._components():
        if isinstance(c, model.LineString) and len(c.coords) and not c.is_closed:
            for p in (tuple(c.coords[0]), tuple(c.coords[-1])):
                count[p] = count.get(p, 0) + 1
    return {p for p, n in count.items() if n % 2 == 1}


def _loc_dim(x: float, y: float, geom, line_bpts=None) -> tuple[int, int]:
    """(location, local dimension) of point (x, y) relative to geom.

    location: I/B/E; dimension: dim of geom's feature at that point (for E
    the dimension is 2 — the exterior is an open region of the plane).
    """
    if line_bpts is None:
        line_bpts = _line_boundary_points(geom)
    best = None  # (priority, loc, dim); interior wins over boundary
    for c in geom._components():
        if isinstance(c, model.Polygon):
            loc = algos.points_in_polygon(np.array([x]), np.array([y]), c)[0]
            if loc == algos.IN:
                return (I, 2)
            if loc == algos.BOUNDARY:
                best = (B, 1) if best is None else best
        elif isinstance(c, model.LineString):
            if algos.points_on_polyline(np.array([x]), np.array([y]), c.coords)[0]:
                if (x, y) in line_bpts:
                    best = (B, 0) if best is None else best
                else:
                    return (I, 1)
        elif isinstance(c, model.Point):
            if x == c.x and y == c.y:
                return (I, 0)
    if best is not None:
        return best
    return (E, 2)


# ---------------------------------------------------------------------------
# relate
# ---------------------------------------------------------------------------

def _features(geom, other) -> list[tuple[float, float, int, int]]:
    """(x, y, own location class, feature dim) samples of `geom`, with every
    1-D feature split at its intersections with `other`."""
    other_segs = _all_segments(other)
    other_pts = _all_vertices(other)
    bpts = _line_boundary_points(geom)
    feats: list[tuple[float, float, int, int]] = []
    for c in geom._components():
        if isinstance(c, model.Point):
            feats.append((c.x, c.y, I, 0))
        elif isinstance(c, model.LineString):
            for v in c.coords:
                tv = (float(v[0]), float(v[1]))
                feats.append((tv[0], tv[1], B if tv in bpts else I, 0))
            for p1, p2 in algos._segs(c.coords):
                cuts = list(other_pts)
                for q1, q2 in other_segs:
                    cuts.extend(_seg_points(tuple(p1), tuple(p2), q1, q2))
                for a, b in _split_segment(tuple(p1), tuple(p2), cuts):
                    feats.append(((a[0] + b[0]) / 2, (a[1] + b[1]) / 2, I, 1))
                    # split points are 0-dim interior features too
                    feats.append((a[0], a[1], I if (a not in bpts) else B, 0))
        elif isinstance(c, model.Polygon):
            for ring in algos._rings(c):
                for v in ring[:-1]:
                    feats.append((float(v[0]), float(v[1]), B, 0))
                for p1, p2 in algos._segs(ring):
                    cuts = list(other_pts)
                    for q1, q2 in other_segs:
                        cuts.extend(_seg_points(tuple(p1), tuple(p2), q1, q2))
                    for a, b in _split_segment(tuple(p1), tuple(p2), cuts):
                        feats.append(((a[0] + b[0]) / 2, (a[1] + b[1]) / 2, B, 1))
                        feats.append((a[0], a[1], B, 0))
    return feats


def _offset_samples(a, b) -> list[tuple[float, float]]:
    """Near-boundary probes: points just off both sides of every split
    sub-segment of both geometries — they land in open 2-D regions
    (polygon interiors / exteriors) and witness the dim-2 matrix cells."""
    xmin = min(a.bounds[0], b.bounds[0])
    ymin = min(a.bounds[1], b.bounds[1])
    xmax = max(a.bounds[2], b.bounds[2])
    ymax = max(a.bounds[3], b.bounds[3])
    eps = max(xmax - xmin, ymax - ymin, 1.0) * 1e-9
    out = []
    for geom, other in ((a, b), (b, a)):
        other_segs = _all_segments(other)
        other_pts = _all_vertices(other)
        for p1, p2 in _all_segments(geom):
            cuts = list(other_pts)
            for q1, q2 in other_segs:
                cuts.extend(_seg_points(p1, p2, q1, q2))
            for s1, s2 in _split_segment(p1, p2, cuts):
                mx, my = (s1[0] + s2[0]) / 2, (s1[1] + s2[1]) / 2
                dx, dy = s2[0] - s1[0], s2[1] - s1[1]
                ln = (dx * dx + dy * dy) ** 0.5
                if ln == 0:
                    continue
                nx, ny = -dy / ln, dx / ln
                out.append((mx + eps * nx, my + eps * ny))
                out.append((mx - eps * nx, my - eps * ny))
    return out


def relate_matrix(a, b) -> list[list[int]]:
    """DE-9IM matrix as a 3x3 list of dims (-1 = empty/F)."""
    m = [[_F] * 3 for _ in range(3)]
    m[E][E] = 2  # bounded geometries: both exteriors share the far plane
    a_bpts = _line_boundary_points(a)
    b_bpts = _line_boundary_points(b)
    for (x, y, own, dim) in _features(a, b):
        lb, _ = _loc_dim(x, y, b, b_bpts)
        m[own][lb] = max(m[own][lb], dim)
    for (x, y, own, dim) in _features(b, a):
        la, _ = _loc_dim(x, y, a, a_bpts)
        m[la][own] = max(m[la][own], dim)
    # dim-2 cells via near-boundary probes on both sides of every edge
    if any(isinstance(c, model.Polygon) for g in (a, b) for c in g._components()):
        for (x, y) in _offset_samples(a, b):
            la, da = _loc_dim(x, y, a, a_bpts)
            lb, db = _loc_dim(x, y, b, b_bpts)
            d = min(da, db)
            if d == 2:  # only open-region witnesses are 2-dim evidence
                m[la][lb] = max(m[la][lb], 2)
    return m


def relate(a, b) -> str:
    """DE-9IM string, row-major II IB IE BI BB BE EI EB EE (JTS toString)."""
    m = relate_matrix(a, b)
    return "".join("F" if v == _F else str(v) for row in m for v in row)


def relate_bool(a, b, pattern: str) -> bool:
    """JTS Geometry.relate(geom, pattern): T/F/0/1/2/* per cell."""
    mat = relate(a, b)
    if len(pattern) != 9:
        raise ValueError(f"bad DE-9IM pattern: {pattern!r}")
    for got, want in zip(mat, pattern.upper()):
        if want == "*":
            continue
        if want == "T":
            if got == "F":
                return False
        elif want == "F":
            if got != "F":
                return False
        elif got != want:
            return False
    return True


# ---------------------------------------------------------------------------
# difference
# ---------------------------------------------------------------------------

def _ear_clip(ring: np.ndarray) -> list[np.ndarray]:
    """Triangulate a simple polygon ring (no holes) by ear clipping.

    Returns closed triangle rings in the input's winding; used to
    decompose non-convex subtrahends into convex pieces for difference.
    """
    pts = [tuple(p) for p in (ring[:-1] if ring[0].tolist() == ring[-1].tolist()
                              else ring)]
    # normalize to CCW
    area2 = sum(pts[i][0] * pts[(i + 1) % len(pts)][1]
                - pts[(i + 1) % len(pts)][0] * pts[i][1]
                for i in range(len(pts)))
    if area2 < 0:
        pts = pts[::-1]
    tris = []
    guard = 0
    while len(pts) > 3 and guard < 10_000:
        guard += 1
        n = len(pts)
        clipped = False
        for i in range(n):
            a, b, c = pts[i - 1], pts[i], pts[(i + 1) % n]
            if algos._orient(*a, *b, *c) <= 0:
                continue  # reflex or collinear vertex
            tri = np.array([a, b, c, a], dtype=np.float64)
            # no other vertex strictly inside the candidate ear
            others = [p for j, p in enumerate(pts)
                      if j not in (i - 1 if i > 0 else n - 1, i, (i + 1) % n)]
            if others:
                ox = np.array([p[0] for p in others])
                oy = np.array([p[1] for p in others])
                if np.any(algos.points_in_ring(ox, oy, tri) == algos.IN):
                    continue
            tris.append(tri)
            del pts[i]
            clipped = True
            break
        if not clipped:
            break  # degenerate input: fall back to what we have
    if len(pts) == 3:
        tris.append(np.array(pts + pts[:1], dtype=np.float64))
    return tris


def _is_convex(ring: np.ndarray) -> bool:
    sgn = 0
    n = len(ring) - 1
    for i in range(n):
        o = algos._orient(*ring[i], *ring[(i + 1) % n], *ring[(i + 2) % n])
        if o != 0:
            if sgn == 0:
                sgn = 1 if o > 0 else -1
            elif (o > 0) != (sgn > 0):
                return False
    return True


def _clip_halfplane(ring: np.ndarray, a, b, keep_left: bool) -> np.ndarray:
    """One Sutherland-Hodgman step: clip closed ring by the half-plane on
    the left (or right) of directed edge a->b."""
    out = []
    n = len(ring) - 1
    for i in range(n):
        p, q = ring[i], ring[i + 1]
        op = algos._orient(*a, *b, *p)
        oq = algos._orient(*a, *b, *q)
        pin = (op >= 0) if keep_left else (op <= 0)
        qin = (oq >= 0) if keep_left else (oq <= 0)
        if pin:
            out.append(p)
        if pin != qin and op != oq:
            t = op / (op - oq)
            out.append((p[0] + t * (q[0] - p[0]), p[1] + t * (q[1] - p[1])))
    if len(out) < 3:
        return np.empty((0, 2))
    arr = np.array(out, dtype=np.float64)
    return np.vstack([arr, arr[:1]])


def _collect_result(out: list):
    if not out:
        return model.GeometryCollection([])
    if len(out) == 1:
        return out[0]
    if all(isinstance(g, model.Point) for g in out):
        return model.MultiPoint(out)
    if all(isinstance(g, model.LineString) for g in out):
        return model.MultiLineString(out)
    if all(isinstance(g, model.Polygon) for g in out):
        return model.MultiPolygon(out)
    return model.GeometryCollection(out)


def difference(a, b):
    """a minus b (JTS ST_Difference semantics on the closed subtrahend).

    Exact for point and line minuends against any b, and for polygon
    minuends against polygonal subtrahends: convex components subtract
    directly by half-plane decomposition (one piece per edge); non-convex
    components are ear-clipped into triangles first and the triangles
    subtracted sequentially (A - (T1 u T2 ...) = ((A-T1)-T2)...).  Holes
    in the MINUEND are just extra subtrahend clips; a subtrahend
    component WITH holes reduces via the set identity
    A - (S \\ H) = (A - S) u (A n H) with A n H = A - (A - H) — every
    term uses only hole-free machinery, and islands nested inside the
    hole are handled because the remaining subtrahend components are
    subtracted from the combined result afterward.  (The reference
    delegates general overlay to JTS, SpatialRelationFunctions.scala:59.)
    """
    holed = [cb for cb in b._components()
             if isinstance(cb, model.Polygon) and cb.holes]
    if holed:
        cb = holed[0]
        rest = [c for c in b._components() if c is not cb]
        shell = model.Polygon(cb.shell.copy())
        parts = [g for g in
                 difference(a, shell)._components()]
        for h in cb.holes:
            hp = model.Polygon(np.array(h, dtype=np.float64).copy())
            inter = intersection(a, hp)
            parts.extend(inter._components())
        combined = _collect_result(
            [p for p in parts
             if not isinstance(p, model.GeometryCollection)])
        if rest:
            return difference(combined, _collect_result(list(rest)))
        return combined

    out = []
    for ca in a._components():
        if isinstance(ca, model.Point):
            if _loc_dim(ca.x, ca.y, b)[0] == E:
                out.append(ca)
        elif isinstance(ca, model.LineString):
            other_segs = _all_segments(b)
            other_pts = _all_vertices(b)
            run: list[tuple] = []
            for p1, p2 in algos._segs(ca.coords):
                cuts = list(other_pts)
                for q1, q2 in other_segs:
                    cuts.extend(_seg_points(tuple(p1), tuple(p2), q1, q2))
                for s1, s2 in _split_segment(tuple(p1), tuple(p2), cuts):
                    mid = ((s1[0] + s2[0]) / 2, (s1[1] + s2[1]) / 2)
                    if _loc_dim(mid[0], mid[1], b)[0] == E:
                        if run and run[-1] == s1:
                            run.append(s2)
                        else:
                            if len(run) >= 2:
                                out.append(model.LineString(np.array(run)))
                            run = [s1, s2]
                    else:
                        if len(run) >= 2:
                            out.append(model.LineString(np.array(run)))
                        run = []
            if len(run) >= 2:
                out.append(model.LineString(np.array(run)))
        elif isinstance(ca, model.Polygon):
            shell_a = ca.shell
            if shell_a[0].tolist() != shell_a[-1].tolist():
                shell_a = np.vstack([shell_a, shell_a[:1]])
            pieces = [shell_a]
            clips: list[np.ndarray] = []
            # minuend holes are just more subtrahend pieces:
            # (shell - holes) - B == ((shell - H1) - H2 ...) - B, so each
            # hole joins the sequential clip list through the same
            # half-plane machinery (fixes the r2 silent wrong answer where
            # holes were dropped and their area wrongly returned)
            for hole in ca.holes:
                h = np.asarray(hole, dtype=np.float64)
                if h[0].tolist() != h[-1].tolist():
                    h = np.vstack([h, h[:1]])
                if _is_convex(h):
                    clips.append(h)
                else:
                    clips.extend(_ear_clip(h))
            for cb in b._components():
                if not isinstance(cb, model.Polygon):
                    continue
                if _is_convex(cb.shell):
                    clips.append(cb.shell)
                else:
                    clips.extend(_ear_clip(cb.shell))
            for shell in clips:
                # orient CCW so "left of edge" means inside
                area2 = 0.0
                for i in range(len(shell) - 1):
                    area2 += shell[i][0] * shell[i + 1][1] - shell[i + 1][0] * shell[i][1]
                if area2 < 0:
                    shell = shell[::-1]
                nxt = []
                for piece in pieces:
                    kept_inside = piece
                    for i in range(len(shell) - 1):
                        e1, e2 = shell[i], shell[i + 1]
                        outside = _clip_halfplane(kept_inside, e1, e2, keep_left=False)
                        if len(outside):
                            nxt.append(outside)
                        kept_inside = _clip_halfplane(kept_inside, e1, e2, keep_left=True)
                        if not len(kept_inside):
                            break
                pieces = nxt
            out.extend(model.Polygon(p) for p in pieces if len(p) >= 4)
    return _collect_result(out)


def _dim_of(g) -> int:
    dims = [2 if isinstance(c, model.Polygon) else
            1 if isinstance(c, model.LineString) else 0
            for c in g._components()]
    return max(dims) if dims else -1


def _closed(ring) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if r[0].tolist() != r[-1].tolist():
        r = np.vstack([r, r[:1]])
    return r


def _convex_rings(shell: np.ndarray) -> list[np.ndarray]:
    """Decompose a simple closed ring into convex closed rings (itself if
    already convex, else its ear-clip triangulation — a PARTITION, so the
    pieces' interiors are disjoint and areas sum exactly)."""
    s = _closed(shell)
    if _is_convex(s):
        return [s]
    return _ear_clip(s)


def _ccw(ring: np.ndarray) -> np.ndarray:
    area2 = 0.0
    for i in range(len(ring) - 1):
        area2 += ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
    return ring[::-1] if area2 < 0 else ring


def intersection(a, b):
    """a intersect b (JTS ST_Intersection semantics).

    Mixed dimension uses the difference identity a n b = a - (a - b) on
    the LOWER-dimension operand (point-in-polygon is a point,
    line-through-polygon is the inside line) — cheap, since point/line
    minuends never fragment.  Polygon n polygon is computed DIRECTLY:
    both shells are convex-decomposed (ear-clip partitions) and clipped
    pairwise with Sutherland-Hodgman (convex clip region required), so
    cost is O(|A| * |B|) pieces — the difference identity would fragment
    exponentially on concave operands.  Holes on either side are
    subtracted from the piece set afterward.  (The reference delegates
    general overlay to JTS, SpatialRelationFunctions.scala:59.)
    """
    if _dim_of(b) < _dim_of(a):
        a, b = b, a
    if _dim_of(a) < 2:
        return difference(a, difference(a, b))

    a_rings: list[np.ndarray] = []
    holes: list[np.ndarray] = []
    b_rings: list[np.ndarray] = []
    for ca in a._components():
        if isinstance(ca, model.Polygon):
            a_rings.extend(_convex_rings(ca.shell))
            holes.extend(np.asarray(h, dtype=np.float64) for h in ca.holes)
    for cb in b._components():
        if isinstance(cb, model.Polygon):
            b_rings.extend(_convex_rings(cb.shell))
            holes.extend(np.asarray(h, dtype=np.float64) for h in cb.holes)

    pieces = []
    for ra in map(_ccw, a_rings):
        for rb in map(_ccw, b_rings):
            clipped = ra
            for i in range(len(rb) - 1):
                clipped = _clip_halfplane(clipped, rb[i], rb[i + 1],
                                          keep_left=True)
                if not len(clipped):
                    break
            if len(clipped) >= 4:
                pieces.append(clipped)
    result = _collect_result([model.Polygon(p) for p in pieces])
    if holes and pieces:
        result = difference(result, _collect_result(
            [model.Polygon(h) for h in holes]))
    return result
