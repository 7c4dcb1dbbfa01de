"""S2 hierarchical cell curve: cell ids, covering, and the S2SFC facade.

Engine analog of the reference's S2 key space (curve/S2SFC.scala:37-64,
index/s2/S2IndexKeySpace.scala:45-48), which delegates to Google's S2
library.  This reimplements the public S2 scheme (s2geometry.io docs /
Apache-2.0 reference implementations): lat/lng -> unit sphere -> cube face
(u,v) -> quadratic (s,t) -> 30-bit (i,j) -> Hilbert position -> 64-bit
cell id, plus the region-coverer algorithm (priority-expansion of the
largest intersecting cells, max-cells budget) and cell-union
normalization.  Golden-tested against S2SFCTest.scala's exact coverings.

Cell id layout: 3 face bits, 2*level Hilbert bits, then a trailing 1
marking the level (lsb).  rangeMin/rangeMax of a cell are id -/+ (lsb-1):
a sorted-by-id layout makes every cell a contiguous scan range — the same
contract as the Z-order curves in cells/zn.py.
"""

from __future__ import annotations


import math

import numpy as np

MAX_LEVEL = 30
MAX_SIZE = 1 << MAX_LEVEL
POS_BITS = 2 * MAX_LEVEL + 1
SWAP_MASK = 1
INVERT_MASK = 2
LOOKUP_BITS = 4

POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)

_LOOKUP_POS = [0] * (1 << (2 * LOOKUP_BITS + 2))
_LOOKUP_IJ = [0] * (1 << (2 * LOOKUP_BITS + 2))


def _init_lookup(level, i, j, orig_orientation, pos, orientation):
    if level == LOOKUP_BITS:
        ij = (i << LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig_orientation] = (pos << 2) + orientation
        _LOOKUP_IJ[(pos << 2) + orig_orientation] = (ij << 2) + orientation
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = POS_TO_IJ[orientation]
    for index in range(4):
        _init_lookup(level, i + (r[index] >> 1), j + (r[index] & 1),
                     orig_orientation, pos + index,
                     orientation ^ POS_TO_ORIENTATION[index])


for _o in (0, SWAP_MASK, INVERT_MASK, SWAP_MASK | INVERT_MASK):
    _init_lookup(0, 0, 0, _o, 0, _o)


# ---------------------------------------------------------------------------
# projections
# ---------------------------------------------------------------------------

def st_to_uv(s: float) -> float:
    """Quadratic ST -> UV (the S2_QUADRATIC_PROJECTION)."""
    if s >= 0.5:
        return (1.0 / 3.0) * (4 * s * s - 1)
    return (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s))


def uv_to_st(u: float) -> float:
    if u >= 0:
        return 0.5 * math.sqrt(1 + 3 * u)
    return 1 - 0.5 * math.sqrt(1 - 3 * u)


def face_uv_to_xyz(face: int, u: float, v: float) -> tuple[float, float, float]:
    if face == 0:
        return (1.0, u, v)
    if face == 1:
        return (-u, 1.0, v)
    if face == 2:
        return (-u, -v, 1.0)
    if face == 3:
        return (-1.0, -v, -u)
    if face == 4:
        return (v, -1.0, -u)
    return (v, u, -1.0)


def xyz_to_face(x: float, y: float, z: float) -> int:
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax > ay:
        face = 0 if ax > az else 2
    else:
        face = 1 if ay > az else 2
    if (x, y, z)[face] < 0:
        face += 3
    return face


def valid_face_xyz_to_uv(face: int, x: float, y: float, z: float) -> tuple[float, float]:
    if face == 0:
        return (y / x, z / x)
    if face == 1:
        return (-x / y, z / y)
    if face == 2:
        return (-x / z, -y / z)
    if face == 3:
        return (z / x, y / x)
    if face == 4:
        return (z / y, -x / y)
    return (-y / z, -x / z)


def _st_to_ij(s: float) -> int:
    return max(0, min(MAX_SIZE - 1, int(math.floor(MAX_SIZE * s))))


# face tangent-axis z components (d(xyz)/du, d(xyz)/dv per face), used by
# the tight lat/lng cell bound below
_U_AXIS_Z = (0.0, 0.0, 0.0, -1.0, -1.0, 0.0)
_V_AXIS_Z = (1.0, 1.0, 0.0, 0.0, 0.0, 0.0)


# ---------------------------------------------------------------------------
# cell ids
# ---------------------------------------------------------------------------

def from_face_ij(face: int, i: int, j: int) -> int:
    """Leaf cell id from face + 30-bit (i, j) (Hilbert lookup loop)."""
    n = face << 60
    bits = face & SWAP_MASK
    mask = (1 << LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * LOOKUP_BITS)) & mask) << (LOOKUP_BITS + 2)
        bits += ((j >> (k * LOOKUP_BITS)) & mask) << 2
        bits = _LOOKUP_POS[bits]
        n |= (bits >> 2) << (k * 2 * LOOKUP_BITS)
        bits &= SWAP_MASK | INVERT_MASK
    return n * 2 + 1


def to_face_ij(cell_id: int) -> tuple[int, int, int]:
    """(face, i, j) of the leaf-aligned position of a cell id."""
    face = cell_id >> POS_BITS
    bits = face & SWAP_MASK
    i = j = 0
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * LOOKUP_BITS) if k == 7 else LOOKUP_BITS
        bits += ((cell_id >> (k * 2 * LOOKUP_BITS + 1))
                 & ((1 << (2 * nbits)) - 1)) << 2
        bits = _LOOKUP_IJ[bits]
        i += (bits >> (LOOKUP_BITS + 2)) << (k * LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << LOOKUP_BITS) - 1)) << (k * LOOKUP_BITS)
        bits &= SWAP_MASK | INVERT_MASK
    return face, i, j


def from_lat_lng(lat_deg: float, lng_deg: float) -> int:
    """Leaf cell id of a lat/lng (S2CellId.fromLatLng)."""
    phi, theta = math.radians(lat_deg), math.radians(lng_deg)
    cosphi = math.cos(phi)
    x, y, z = math.cos(theta) * cosphi, math.sin(theta) * cosphi, math.sin(phi)
    face = xyz_to_face(x, y, z)
    u, v = valid_face_xyz_to_uv(face, x, y, z)
    return from_face_ij(face, _st_to_ij(uv_to_st(u)), _st_to_ij(uv_to_st(v)))


def lsb(cell_id: int) -> int:
    return cell_id & (~cell_id + 1)


def level(cell_id: int) -> int:
    return MAX_LEVEL - (lsb(cell_id).bit_length() - 1) // 2


def range_min(cell_id: int) -> int:
    return cell_id - (lsb(cell_id) - 1)


def range_max(cell_id: int) -> int:
    return cell_id + (lsb(cell_id) - 1)


def parent(cell_id: int, lvl: int) -> int:
    new_lsb = 1 << (2 * (MAX_LEVEL - lvl))
    return (cell_id & (~new_lsb + 1) & ~(new_lsb - 1)) | new_lsb


def children(cell_id: int) -> list[int]:
    child_lsb = lsb(cell_id) >> 2
    begin = cell_id - lsb(cell_id) + child_lsb
    return [begin + 2 * i * child_lsb for i in range(4)]


def to_lat_lng(cell_id: int) -> tuple[float, float]:
    """(lng_deg, lat_deg) of the cell center (S2CellId.toLatLng)."""
    face, i, j = to_face_ij(cell_id)
    # center correction: offset to the center of the cell at its level
    lvl = level(cell_id)
    if lvl < MAX_LEVEL:
        size = 1 << (MAX_LEVEL - lvl)
        i = (i & -size) + size // 2
        j = (j & -size) + size // 2
        si, ti = (2 * i) / (2.0 * MAX_SIZE), (2 * j) / (2.0 * MAX_SIZE)
    else:
        si, ti = (2 * i + 1) / (2.0 * MAX_SIZE), (2 * j + 1) / (2.0 * MAX_SIZE)
    u, v = st_to_uv(si), st_to_uv(ti)
    x, y, z = face_uv_to_xyz(face, u, v)
    lat = math.atan2(z, math.hypot(x, y))
    lng = math.atan2(y, x)
    return math.degrees(lng), math.degrees(lat)


# ---------------------------------------------------------------------------
# cell geometry: tight lat/lng bound (S2Cell.getRectBound)
# ---------------------------------------------------------------------------

_MAX_ERROR = 1.0 / (1 << 51)
_POLE_MIN_LAT = math.asin(math.sqrt(1.0 / 3.0))
_PI_2 = math.pi / 2
_PI_4 = math.pi / 4


class LatLngRect:
    """Lat interval [lat_lo, lat_hi] x S1 lng interval [lng_lo, lng_hi]
    (lng wraps; lo > hi means the interval crosses the antimeridian)."""

    __slots__ = ("lat_lo", "lat_hi", "lng_lo", "lng_hi")

    def __init__(self, lat_lo, lat_hi, lng_lo, lng_hi):
        self.lat_lo, self.lat_hi = lat_lo, lat_hi
        self.lng_lo, self.lng_hi = lng_lo, lng_hi

    # -- S1 interval helpers ------------------------------------------------
    def _lng_full(self) -> bool:
        return self.lng_lo == -math.pi and self.lng_hi == math.pi

    def _lng_empty(self) -> bool:
        return self.lng_lo == math.pi and self.lng_hi == -math.pi

    def _lng_inverted(self) -> bool:
        return self.lng_lo > self.lng_hi

    def _lng_contains_interval(self, o) -> bool:
        if self._lng_inverted():
            if o._lng_inverted():
                return o.lng_lo >= self.lng_lo and o.lng_hi <= self.lng_hi
            return ((o.lng_lo >= self.lng_lo or o.lng_hi <= self.lng_hi)
                    and not self._lng_empty())
        if o._lng_inverted():
            return self._lng_full() or o._lng_empty()
        return o.lng_lo >= self.lng_lo and o.lng_hi <= self.lng_hi

    def _lng_intersects_interval(self, o) -> bool:
        if self._lng_empty() or o._lng_empty():
            return False
        if self._lng_inverted():
            return (o._lng_inverted() or o.lng_lo <= self.lng_hi
                    or o.lng_hi >= self.lng_lo)
        if o._lng_inverted():
            return o.lng_lo <= self.lng_hi or o.lng_hi >= self.lng_lo
        return o.lng_lo <= self.lng_hi and o.lng_hi >= self.lng_lo

    # -- rect ops -----------------------------------------------------------
    def contains_rect(self, o: "LatLngRect") -> bool:
        return (self.lat_lo <= o.lat_lo and self.lat_hi >= o.lat_hi
                and self._lng_contains_interval(o))

    def intersects_rect(self, o: "LatLngRect") -> bool:
        if self.lat_lo > o.lat_hi or self.lat_hi < o.lat_lo:
            return False
        return self._lng_intersects_interval(o)

    def vertices(self):
        return ((self.lat_lo, self.lng_lo), (self.lat_lo, self.lng_hi),
                (self.lat_hi, self.lng_hi), (self.lat_hi, self.lng_lo))

    def center(self) -> tuple[float, float]:
        lat = 0.5 * (self.lat_lo + self.lat_hi)
        span = self.lng_hi - self.lng_lo
        if self._lng_inverted():
            span += 2 * math.pi
        lng = self.lng_lo + span / 2
        if lng > math.pi:
            lng -= 2 * math.pi
        return (lat, lng)


def _s1_from_point_pair(a: float, b: float) -> tuple[float, float]:
    if a == -math.pi:
        a = math.pi
    if b == -math.pi:
        b = math.pi
    if (b - a) % (2 * math.pi) <= math.pi:
        return (a, b)
    return (b, a)


def _s1_expanded(lo: float, hi: float, margin: float) -> tuple[float, float]:
    span = (hi - lo) % (2 * math.pi)
    if lo == math.pi and hi == -math.pi:  # empty
        return (lo, hi)
    if span + 2 * margin >= 2 * math.pi - 1e-15:
        return (-math.pi, math.pi)
    lo2 = math.remainder(lo - margin, 2 * math.pi)
    hi2 = math.remainder(hi + margin, 2 * math.pi)
    if lo2 <= -math.pi:
        lo2 = math.pi
    return (lo2, hi2)


class Cell:
    """A cell with its UV rect, for bound computation."""

    __slots__ = ("id", "face", "level", "uv")

    def __init__(self, cell_id: int):
        self.id = cell_id
        self.level = level(cell_id)
        face, i, j = to_face_ij(cell_id)
        self.face = face
        size = 1 << (MAX_LEVEL - self.level)
        i0, j0 = i & -size, j & -size
        self.uv = ((st_to_uv(i0 / MAX_SIZE), st_to_uv((i0 + size) / MAX_SIZE)),
                   (st_to_uv(j0 / MAX_SIZE), st_to_uv((j0 + size) / MAX_SIZE)))

    def _vertex_lat(self, i: int, j: int) -> float:
        x, y, z = face_uv_to_xyz(self.face, self.uv[0][i], self.uv[1][j])
        return math.atan2(z, math.hypot(x, y))

    def _vertex_lng(self, i: int, j: int) -> float:
        x, y, z = face_uv_to_xyz(self.face, self.uv[0][i], self.uv[1][j])
        return math.atan2(y, x)

    def rect_bound(self) -> LatLngRect:
        if self.level > 0:
            u = self.uv[0][0] + self.uv[0][1]
            v = self.uv[1][0] + self.uv[1][1]
            i = (1 if u < 0 else 0) if _U_AXIS_Z[self.face] == 0 \
                else (1 if u > 0 else 0)
            j = (1 if v < 0 else 0) if _V_AXIS_Z[self.face] == 0 \
                else (1 if v > 0 else 0)
            lat_a = self._vertex_lat(i, j)
            lat_b = self._vertex_lat(1 - i, 1 - j)
            lat_lo = max(-_PI_2, min(lat_a, lat_b) - _MAX_ERROR)
            lat_hi = min(_PI_2, max(lat_a, lat_b) + _MAX_ERROR)
            if lat_lo == -_PI_2 or lat_hi == _PI_2:
                return LatLngRect(lat_lo, lat_hi, -math.pi, math.pi)
            lng_a = self._vertex_lng(i, 1 - j)
            lng_b = self._vertex_lng(1 - i, j)
            lo, hi = _s1_from_point_pair(lng_a, lng_b)
            lo, hi = _s1_expanded(lo, hi, _MAX_ERROR)
            return LatLngRect(lat_lo, lat_hi, lo, hi)
        # face cells: exact hardcoded bounds
        f = self.face
        if f == 0:
            return LatLngRect(-_PI_4, _PI_4, -_PI_4, _PI_4)
        if f == 1:
            return LatLngRect(-_PI_4, _PI_4, _PI_4, 3 * _PI_4)
        if f == 2:
            return LatLngRect(_POLE_MIN_LAT, _PI_2, -math.pi, math.pi)
        if f == 3:
            return LatLngRect(-_PI_4, _PI_4, 3 * _PI_4, -3 * _PI_4)
        if f == 4:
            return LatLngRect(-_PI_4, _PI_4, -3 * _PI_4, -_PI_4)
        return LatLngRect(-_PI_2, -_POLE_MIN_LAT, -math.pi, math.pi)


# ---------------------------------------------------------------------------
# region coverer (S2RegionCoverer, non-interior, for S2LatLngRect regions)
# ---------------------------------------------------------------------------

# quadratic-projection min-width metric derivative (S2Projections.MIN_WIDTH)
_MIN_WIDTH_DERIV = math.sqrt(2.0) / 3.0


def _min_width_max_level(value: float) -> int:
    """Largest level L with min_width(L) = deriv * 2^-L >= value."""
    if value <= 0:
        return MAX_LEVEL
    return max(0, min(MAX_LEVEL, int(math.floor(math.log2(_MIN_WIDTH_DERIV / value)))))


def _latlng_to_xyz(lat: float, lng: float) -> tuple[float, float, float]:
    cosl = math.cos(lat)
    return (math.cos(lng) * cosl, math.sin(lng) * cosl, math.sin(lat))


def _rect_cap_angle(rect: LatLngRect) -> tuple[float, float, float, float]:
    """Bounding cap of a lat/lng rect: (axis xyz..., angle_radians)
    (S2LatLngRect.getCapBound)."""
    # pole cap
    if rect.lat_lo + rect.lat_hi < 0:
        pole_z, pole_angle = -1.0, _PI_2 + rect.lat_hi
    else:
        pole_z, pole_angle = 1.0, _PI_2 - rect.lat_lo
    pole = ((0.0, 0.0, pole_z), pole_angle)
    # mid cap (for rects spanning <= 180 deg of longitude)
    span = rect.lng_hi - rect.lng_lo
    if not rect._lng_inverted() and span < 2 * math.pi:
        clat, clng = rect.center()
        axis = _latlng_to_xyz(clat, clng)
        height = 0.0
        for vlat, vlng in rect.vertices():
            p = _latlng_to_xyz(vlat, vlng)
            d2 = sum((a - b) ** 2 for a, b in zip(axis, p))
            height = max(height, 0.5 * d2)
        mid_angle = 2 * math.asin(math.sqrt(min(0.5 * height, 1.0)))
        pole_height = 1 - math.cos(pole_angle)
        if height < pole_height:
            return (*axis, mid_angle)
    return (*pole[0], pole[1])


class _Candidate:
    __slots__ = ("cell", "is_terminal", "children")

    def __init__(self, cell: Cell, is_terminal: bool):
        self.cell = cell
        self.is_terminal = is_terminal
        self.children: list[_Candidate] = []


class _JavaHeap:
    """java.util.PriorityQueue's exact binary-heap mechanics (siftUp on
    add, move-last + siftDown on poll).  The coverer's candidate priority
    has frequent TIES, and which tied candidate is expanded first changes
    the covering when the cell budget runs out mid-tie — so tie resolution
    must match the reference library's heap order, not heapq's."""

    __slots__ = ("_q",)

    def __init__(self):
        self._q: list[tuple[int, _Candidate]] = []

    def __len__(self):
        return len(self._q)

    def add(self, priority: int, cand: _Candidate):
        q = self._q
        k = len(q)
        q.append((priority, cand))
        while k > 0:
            p = (k - 1) >> 1
            if priority >= q[p][0]:
                break
            q[k] = q[p]
            k = p
        q[k] = (priority, cand)

    def poll(self) -> _Candidate:
        q = self._q
        head = q[0]
        last = q.pop()
        size = len(q)
        if size:
            key = last
            k = 0
            half = size >> 1
            while k < half:
                child = 2 * k + 1
                c = q[child]
                right = child + 1
                if right < size and c[0] > q[right][0]:
                    child = right
                    c = q[child]
                if key[0] <= c[0]:
                    break
                q[k] = c
                k = child
            q[k] = key
        return head[1]


class RegionCoverer:
    """Covering of a LatLngRect with at most ~max_cells cells
    (S2RegionCoverer.getCovering, non-interior)."""

    def __init__(self, min_level=0, max_level=MAX_LEVEL, level_mod=1, max_cells=8):
        self.min_level = min_level
        self.max_level = max_level
        self.level_mod = max(1, level_mod)
        self.max_cells = max_cells
        self._seq = 0

    @property
    def _max_children_shift(self) -> int:
        return 2 * self.level_mod

    def _new_candidate(self, rect: LatLngRect, cell: Cell):
        bound = cell.rect_bound()
        if not rect.intersects_rect(bound):  # mayIntersect
            return None
        is_terminal = False
        if cell.level >= self.min_level:
            if (cell.level + self.level_mod > self.max_level
                    or rect.contains_rect(bound)):
                is_terminal = True
        return _Candidate(cell, is_terminal)

    def _expand_children(self, rect, candidate, cell, num_levels) -> int:
        num_levels -= 1
        num_terminals = 0
        for child_id in children(cell.id):
            child_cell = Cell(child_id)
            if num_levels > 0:
                if rect.intersects_rect(child_cell.rect_bound()):
                    num_terminals += self._expand_children(
                        rect, candidate, child_cell, num_levels)
                continue
            child = self._new_candidate(rect, child_cell)
            if child is not None:
                candidate.children.append(child)
                if child.is_terminal:
                    num_terminals += 1
        return num_terminals

    def _add_candidate(self, rect, candidate, queue, result):
        if candidate is None:
            return
        if candidate.is_terminal:
            result.append(candidate.cell.id)
            return
        num_levels = 1 if candidate.cell.level < self.min_level else self.level_mod
        num_terminals = self._expand_children(rect, candidate,
                                              candidate.cell, num_levels)
        if not candidate.children:
            return
        if (num_terminals == 1 << self._max_children_shift
                and candidate.cell.level >= self.min_level):
            candidate.is_terminal = True
            self._add_candidate(rect, candidate, queue, result)
            return
        # expand the largest cells first; tie-break fewer children, then
        # fewer terminal children.  NOTE: the packed composite is kept
        # verbatim from the reference coverer — with 4 children/terminals
        # the 2-bit fields overflow into the next field, and that overflow
        # is part of the observable ordering.  Frequent ties resolve by
        # the emulated java heap order (_JavaHeap).
        composite = (((candidate.cell.level << 2) + len(candidate.children))
                     << 2) + num_terminals
        queue.add(composite, candidate)

    def _initial_candidates(self, rect, queue, result):
        if self.max_cells >= 4:
            ax, ay, az, angle = _rect_cap_angle(rect)
            lvl = min(_min_width_max_level(2 * angle),
                      min(self.max_level, MAX_LEVEL - 1))
            if self.level_mod > 1 and lvl > self.min_level:
                lvl -= (lvl - self.min_level) % self.level_mod
            if lvl > 0:
                lat = math.atan2(az, math.hypot(ax, ay))
                lng = math.atan2(ay, ax)
                leaf = from_lat_lng(math.degrees(lat), math.degrees(lng))
                for cid in _vertex_neighbors(leaf, lvl):
                    self._add_candidate(rect, self._new_candidate(rect, Cell(cid)),
                                        queue, result)
                return
        for face in range(6):
            face_id = (face << POS_BITS) + (1 << (POS_BITS - 1))
            self._add_candidate(rect, self._new_candidate(rect, Cell(face_id)),
                                queue, result)

    def covering(self, rect: LatLngRect) -> list[int]:
        queue = _JavaHeap()
        result: list[int] = []
        self._initial_candidates(rect, queue, result)
        while len(queue):
            candidate = queue.poll()
            if (candidate.cell.level < self.min_level
                    or len(candidate.children) == 1
                    or len(result) + len(queue) + len(candidate.children)
                    <= self.max_cells):
                for child in candidate.children:
                    self._add_candidate(rect, child, queue, result)
            else:
                candidate.is_terminal = True
                candidate.children = []
                result.append(candidate.cell.id)
        return _normalize(result)


def _vertex_neighbors(leaf_id: int, lvl: int) -> list[int]:
    """The <=4 cells at `lvl` sharing the vertex of `leaf_id`'s enclosing
    cell closest to the leaf (S2CellId.getVertexNeighbors)."""
    face, i, j = to_face_ij(leaf_id)
    halfsize = 1 << (MAX_LEVEL - (lvl + 1))
    size = halfsize << 1
    if i & halfsize:
        ioffset, isame = size, (i + size) < MAX_SIZE
    else:
        ioffset, isame = -size, (i - size) >= 0
    if j & halfsize:
        joffset, jsame = size, (j + size) < MAX_SIZE
    else:
        joffset, jsame = -size, (j - size) >= 0
    out = [parent(leaf_id, lvl),
           parent(_from_face_ij_same(face, i + ioffset, j, isame), lvl),
           parent(_from_face_ij_same(face, i, j + joffset, jsame), lvl)]
    if isame or jsame:
        out.append(parent(_from_face_ij_same(face, i + ioffset, j + joffset,
                                             isame and jsame), lvl))
    return out


def _from_face_ij_same(face: int, i: int, j: int, same: bool) -> int:
    if same:
        return from_face_ij(face, i, j)
    # wrap onto the adjacent face: project the (just out of range) leaf
    # center through the sphere and reproject
    i = max(-1, min(MAX_SIZE, i))
    j = max(-1, min(MAX_SIZE, j))
    scale = 1.0 / MAX_SIZE
    s = scale * ((i << 1) + 1 - MAX_SIZE) * 0.5 + 0.5
    t = scale * ((j << 1) + 1 - MAX_SIZE) * 0.5 + 0.5
    x, y, z = face_uv_to_xyz(face, 2 * s - 1, 2 * t - 1)
    nf = xyz_to_face(x, y, z)
    u, v = valid_face_xyz_to_uv(nf, x, y, z)
    return from_face_ij(nf, _st_to_ij(uv_to_st(u)), _st_to_ij(uv_to_st(v)))


def _normalize(ids: list[int]) -> list[int]:
    """S2CellUnion.normalize: sort, drop contained, merge sibling quads."""
    ids = sorted(ids)
    out: list[int] = []
    for cid in ids:
        if out and range_max(out[-1]) >= range_min(cid):
            continue  # contained in (or overlapping) the previous cell
        # merge complete groups of 4 siblings into the parent, repeatedly
        while len(out) >= 3:
            last3 = out[-3:]
            if (lsb(cid) == lsb(last3[0]) == lsb(last3[1]) == lsb(last3[2])
                    and level(cid) > 0):
                lvl = level(cid)
                p = parent(cid, lvl - 1)
                if ([parent(c, lvl - 1) for c in last3] == [p, p, p]
                        and sorted(last3 + [cid]) == children(p)):
                    out = out[:-3]
                    cid = p
                    continue
            break
        out.append(cid)
    return out


# ---------------------------------------------------------------------------
# S2SFC facade (curve/S2SFC.scala API)
# ---------------------------------------------------------------------------

class IndexRange:
    __slots__ = ("lower", "upper", "contained")

    def __init__(self, lower: int, upper: int, contained: bool = True):
        self.lower, self.upper, self.contained = lower, upper, contained

    def __eq__(self, other):
        return (self.lower, self.upper) == (other.lower, other.upper)

    def __repr__(self):
        return f"IndexRange({self.lower}, {self.upper})"


def _to_s64(v: int) -> int:
    """Unsigned 64-bit id -> java-style signed long (faces 4-5 wrap
    negative, exactly as the reference library's S2CellId.id() does).
    Each cell's [rangeMin, rangeMax] stays within one face, so signed
    BETWEEN predicates remain correct per range."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _from_s64(v: int) -> int:
    return v + (1 << 64) if v < 0 else v


class S2SFC:
    """S2 space-filling curve (curve/S2SFC.scala:37-64 semantics).

    Default parameters (0, 30, 1, 8) mirror the reference's
    `google.s2.coverer.config` defaults (conf/QueryProperties.scala:32).
    Ids are returned as java-style signed 64-bit values."""

    LON_MIN, LON_MAX, LAT_MIN, LAT_MAX = -180.0, 180.0, -90.0, 90.0

    def __init__(self, min_level: int = 0, max_level: int = MAX_LEVEL,
                 level_mod: int = 1, max_cells: int = 8):
        self._coverer = RegionCoverer(min_level, max_level, level_mod, max_cells)

    def index(self, x: float, y: float, lenient: bool = False) -> int:
        if lenient:
            x = min(max(x, self.LON_MIN), self.LON_MAX)
            y = min(max(y, self.LAT_MIN), self.LAT_MAX)
        elif not (self.LON_MIN <= x <= self.LON_MAX
                  and self.LAT_MIN <= y <= self.LAT_MAX):
            raise ValueError(f"Value(s) out of bounds: {x}, {y}")
        return _to_s64(from_lat_lng(y, x))

    def index_np(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Vectorized leaf ids (the Arrow-batch kernel for cell assignment).

        Same math as from_lat_lng over numpy arrays; the Hilbert loop runs
        8 table lookups per point via np.take — no per-row Python."""
        lon = np.clip(np.asarray(lon, np.float64), self.LON_MIN, self.LON_MAX)
        lat = np.clip(np.asarray(lat, np.float64), self.LAT_MIN, self.LAT_MAX)
        phi, theta = np.radians(lat), np.radians(lon)
        cosphi = np.cos(phi)
        x, y, z = np.cos(theta) * cosphi, np.sin(theta) * cosphi, np.sin(phi)
        ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
        face = np.where(ax > ay, np.where(ax > az, 0, 2),
                        np.where(ay > az, 1, 2))
        comp = np.choose(face, [x, y, z])
        face = np.where(comp < 0, face + 3, face).astype(np.int64)
        # u/v per face
        u = np.empty_like(x)
        v = np.empty_like(x)
        with np.errstate(divide="ignore", invalid="ignore"):
            uv_by_face = [
                (y / x, z / x), (-x / y, z / y), (-x / z, -y / z),
                (z / x, y / x), (z / y, -x / y), (-y / z, -x / z)]
        for f in range(6):
            m = face == f
            u[m] = uv_by_face[f][0][m]
            v[m] = uv_by_face[f][1][m]
        with np.errstate(invalid="ignore"):  # np.where evaluates both arms
            s = np.where(u >= 0, 0.5 * np.sqrt(1 + 3 * u),
                         1 - 0.5 * np.sqrt(1 - 3 * u))
            t = np.where(v >= 0, 0.5 * np.sqrt(1 + 3 * v),
                         1 - 0.5 * np.sqrt(1 - 3 * v))
        i = np.clip(np.floor(MAX_SIZE * s), 0, MAX_SIZE - 1).astype(np.int64)
        j = np.clip(np.floor(MAX_SIZE * t), 0, MAX_SIZE - 1).astype(np.int64)
        lookup = np.array(_LOOKUP_POS, dtype=np.int64)
        n = face << np.int64(60)
        bits = face & SWAP_MASK
        mask = (1 << LOOKUP_BITS) - 1
        for k in range(7, -1, -1):
            bits = bits + (((i >> (k * LOOKUP_BITS)) & mask) << (LOOKUP_BITS + 2))
            bits = bits + (((j >> (k * LOOKUP_BITS)) & mask) << 2)
            bits = lookup[bits]
            n = n | ((bits >> 2) << np.int64(k * 2 * LOOKUP_BITS))
            bits = bits & (SWAP_MASK | INVERT_MASK)
        # two's-complement wrap for faces 4-5 is intentional (java longs)
        with np.errstate(over="ignore"):
            return (n.view(np.uint64) * np.uint64(2) + np.uint64(1)).view(np.int64)

    def ranges(self, xy: list[tuple], max_ranges: int | None = None) -> list[IndexRange]:
        out = []
        for (xmin, ymin, xmax, ymax) in xy:
            rect = LatLngRect(math.radians(ymin), math.radians(ymax),
                              math.radians(xmin), math.radians(xmax))
            for cid in self._coverer.covering(rect):
                out.append(IndexRange(_to_s64(range_min(cid)),
                                      _to_s64(range_max(cid)), True))
        return out

    def invert(self, i: int) -> tuple[float, float]:
        return to_lat_lng(_from_s64(i))
