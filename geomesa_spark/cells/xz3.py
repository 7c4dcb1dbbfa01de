"""XZ3 curve: spatio-temporal extents (non-point geometry + time interval).

The 3-dimensional extension of XZ-Ordering (Böhm/Klump/Kriegel SSD 1999),
matching the reference's conventions (curve/XZ3SFC.scala): a (bbox, time
range) is normalized to [0,1]^3 against (lon, lat, offset-within-time-bin),
the sequence-code length is l1 or l1+1 via the two-cell predicate, and
covers enumerate octree elements whose extended (2x) footprint intersects
the query.  Sequence codes are octal path prefixes mapped to longs via
``cs += 1 + q*(8^(g-i) - 1)/7``.

Default z bounds are one week of seconds — the reference's
``XZ3SFC(g, TimePeriod.Week)`` (BinnedTime.maxOffset).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass
from math import floor, log

import numpy as np

from geomesa_spark.cells.z3 import BinnedTime
from geomesa_spark.cells.zn import DEFAULT_MAX_RANGES, IndexRange

_LOG_HALF = log(0.5)


@dataclass(frozen=True)
class _QueryWindow:
    xmin: float
    ymin: float
    zmin: float
    xmax: float
    ymax: float
    zmax: float


class XZ3SFC:
    def __init__(self, g: int, x_bounds: tuple[float, float] = (-180.0, 180.0),
                 y_bounds: tuple[float, float] = (-90.0, 90.0),
                 z_bounds: tuple[float, float] | None = None,
                 period: str = "week"):
        self.g = g
        self.xlo, self.xhi = x_bounds
        self.ylo, self.yhi = y_bounds
        if z_bounds is None:
            z_bounds = (0.0, float(BinnedTime.max_offset(period)))
        self.zlo, self.zhi = z_bounds
        self.xsize = self.xhi - self.xlo
        self.ysize = self.yhi - self.ylo
        self.zsize = self.zhi - self.zlo
        # 8^k for k = 0..g+1 (python ints, no overflow)
        self._pow8 = [8 ** k for k in range(g + 2)]

    # -- normalization ------------------------------------------------------

    def _normalize(self, xmin, ymin, zmin, xmax, ymax, zmax, lenient=False):
        if xmin > xmax or ymin > ymax or zmin > zmax:
            raise ValueError(
                f"bounds must be ordered: [{xmin} {xmax}] [{ymin} {ymax}] [{zmin} {zmax}]")
        in_bounds = (self.xlo <= xmin and xmax <= self.xhi
                     and self.ylo <= ymin and ymax <= self.yhi
                     and self.zlo <= zmin and zmax <= self.zhi)
        if not in_bounds:
            if not lenient:
                raise ValueError(
                    f"values out of bounds: [{xmin} {xmax}] [{ymin} {ymax}] [{zmin} {zmax}]")
            xmin = min(max(xmin, self.xlo), self.xhi)
            xmax = min(max(xmax, self.xlo), self.xhi)
            ymin = min(max(ymin, self.ylo), self.yhi)
            ymax = min(max(ymax, self.ylo), self.yhi)
            zmin = min(max(zmin, self.zlo), self.zhi)
            zmax = min(max(zmax, self.zlo), self.zhi)
        return ((xmin - self.xlo) / self.xsize, (ymin - self.ylo) / self.ysize,
                (zmin - self.zlo) / self.zsize, (xmax - self.xlo) / self.xsize,
                (ymax - self.ylo) / self.ysize, (zmax - self.zlo) / self.zsize)

    # -- indexing -----------------------------------------------------------

    def index(self, xmin: float, ymin: float, zmin: float,
              xmax: float, ymax: float, zmax: float,
              lenient: bool = False) -> int:
        nxmin, nymin, nzmin, nxmax, nymax, nzmax = self._normalize(
            xmin, ymin, zmin, xmax, ymax, zmax, lenient)
        max_dim = max(nxmax - nxmin, nymax - nymin, nzmax - nzmin)
        if max_dim == 0.0:
            length = self.g
        else:
            l1 = int(floor(log(max_dim) / _LOG_HALF))
            if l1 >= self.g:
                length = self.g
            else:
                w2 = 0.5 ** (l1 + 1)

                def predicate(lo: float, hi: float) -> bool:
                    return hi <= (floor(lo / w2) * w2) + 2 * w2

                length = l1 + 1 if (predicate(nxmin, nxmax) and predicate(nymin, nymax)
                                    and predicate(nzmin, nzmax)) else l1
        return self._sequence_code(nxmin, nymin, nzmin, length)

    def index_np(self, xmin: np.ndarray, ymin: np.ndarray, zmin: np.ndarray,
                 xmax: np.ndarray, ymax: np.ndarray, zmax: np.ndarray) -> np.ndarray:
        """Vectorized (lenient) index over (bbox, time-range) arrays."""
        nxmin = (np.clip(xmin, self.xlo, self.xhi) - self.xlo) / self.xsize
        nxmax = (np.clip(xmax, self.xlo, self.xhi) - self.xlo) / self.xsize
        nymin = (np.clip(ymin, self.ylo, self.yhi) - self.ylo) / self.ysize
        nymax = (np.clip(ymax, self.ylo, self.yhi) - self.ylo) / self.ysize
        nzmin = (np.clip(zmin, self.zlo, self.zhi) - self.zlo) / self.zsize
        nzmax = (np.clip(zmax, self.zlo, self.zhi) - self.zlo) / self.zsize
        max_dim = np.maximum(np.maximum(nxmax - nxmin, nymax - nymin), nzmax - nzmin)
        with np.errstate(divide="ignore"):
            l1 = np.where(max_dim > 0,
                          np.floor(np.log(np.maximum(max_dim, 1e-300)) / _LOG_HALF),
                          self.g)
        l1 = np.minimum(l1, self.g).astype(np.int64)
        w2 = np.power(0.5, (l1 + 1).astype(np.float64))
        pred = ((nxmax <= np.floor(nxmin / w2) * w2 + 2 * w2)
                & (nymax <= np.floor(nymin / w2) * w2 + 2 * w2)
                & (nzmax <= np.floor(nzmin / w2) * w2 + 2 * w2))
        length = np.where((l1 < self.g) & pred, l1 + 1, l1)
        length = np.minimum(length, self.g)

        n = len(length)
        cs = np.zeros(n, dtype=np.int64)
        cur = [np.zeros(n), np.zeros(n), np.zeros(n),
               np.ones(n), np.ones(n), np.ones(n)]
        pow8 = np.array(self._pow8[: self.g + 1], dtype=np.int64)
        for i in range(int(length.max()) if n else 0):
            active = i < length
            xc = (cur[0] + cur[3]) / 2.0
            yc = (cur[1] + cur[4]) / 2.0
            zc = (cur[2] + cur[5]) / 2.0
            qx = nxmin >= xc
            qy = nymin >= yc
            qz = nzmin >= zc
            q = qx.astype(np.int64) + 2 * qy.astype(np.int64) + 4 * qz.astype(np.int64)
            step = 1 + q * ((pow8[self.g - i] - 1) // 7)
            cs = np.where(active, cs + step, cs)
            cur[3] = np.where(active & ~qx, xc, cur[3])
            cur[0] = np.where(active & qx, xc, cur[0])
            cur[4] = np.where(active & ~qy, yc, cur[4])
            cur[1] = np.where(active & qy, yc, cur[1])
            cur[5] = np.where(active & ~qz, zc, cur[5])
            cur[2] = np.where(active & qz, zc, cur[2])
        return cs

    def _sequence_code(self, x: float, y: float, z: float, length: int) -> int:
        xmin, ymin, zmin, xmax, ymax, zmax = 0.0, 0.0, 0.0, 1.0, 1.0, 1.0
        cs = 0
        for i in range(length):
            xc = (xmin + xmax) / 2.0
            yc = (ymin + ymax) / 2.0
            zc = (zmin + zmax) / 2.0
            q = (0 if x < xc else 1) + (0 if y < yc else 2) + (0 if z < zc else 4)
            cs += 1 + q * ((self._pow8[self.g - i] - 1) // 7)
            if x < xc:
                xmax = xc
            else:
                xmin = xc
            if y < yc:
                ymax = yc
            else:
                ymin = yc
            if z < zc:
                zmax = zc
            else:
                zmin = zc
        return cs

    def _sequence_interval(self, x: float, y: float, z: float, length: int,
                           partial: bool) -> tuple[int, int]:
        lo = self._sequence_code(x, y, z, length)
        hi = lo if partial else lo + (self._pow8[self.g - length + 1] - 1) // 7
        return lo, hi

    # -- covers -------------------------------------------------------------

    def ranges(self, queries: list[tuple],
               max_ranges: int | None = None) -> list[IndexRange]:
        windows = [_QueryWindow(*self._normalize(*q)) for q in queries]
        return self._ranges(windows, max_ranges if max_ranges is not None else DEFAULT_MAX_RANGES)

    def _ranges(self, query: list[_QueryWindow], range_stop: int) -> list[IndexRange]:
        ranges: list[IndexRange] = []
        # element = (xmin, ymin, zmin, xmax, ymax, zmax, length); extended
        # footprint adds +length to the max bounds
        remaining: deque[tuple | None] = deque()

        def is_contained(el) -> bool:
            xmin, ymin, zmin, xmax, ymax, zmax, ln = el
            return any(w.xmin <= xmin and w.ymin <= ymin and w.zmin <= zmin
                       and w.xmax >= xmax + ln and w.ymax >= ymax + ln
                       and w.zmax >= zmax + ln for w in query)

        def is_overlapped(el) -> bool:
            xmin, ymin, zmin, xmax, ymax, zmax, ln = el
            return any(w.xmax >= xmin and w.ymax >= ymin and w.zmax >= zmin
                       and w.xmin <= xmax + ln and w.ymin <= ymax + ln
                       and w.zmin <= zmax + ln for w in query)

        def children(el):
            xmin, ymin, zmin, xmax, ymax, zmax, ln = el
            xc = (xmin + xmax) / 2.0
            yc = (ymin + ymax) / 2.0
            zc = (zmin + zmax) / 2.0
            half = ln / 2.0
            return (
                (xmin, ymin, zmin, xc, yc, zc, half),
                (xc, ymin, zmin, xmax, yc, zc, half),
                (xmin, yc, zmin, xc, ymax, zc, half),
                (xc, yc, zmin, xmax, ymax, zc, half),
                (xmin, ymin, zc, xc, yc, zmax, half),
                (xc, ymin, zc, xmax, yc, zmax, half),
                (xmin, yc, zc, xc, ymax, zmax, half),
                (xc, yc, zc, xmax, ymax, zmax, half),
            )

        def check_value(el, level: int) -> None:
            if is_contained(el):
                lo, hi = self._sequence_interval(el[0], el[1], el[2], level, partial=False)
                ranges.append(IndexRange(lo, hi, True))
            elif is_overlapped(el):
                lo, hi = self._sequence_interval(el[0], el[1], el[2], level, partial=True)
                ranges.append(IndexRange(lo, hi, False))
                for c in children(el):
                    remaining.append(c)

        for c in children((0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0)):
            remaining.append(c)
        remaining.append(None)
        level = 1

        while level < self.g and remaining and len(ranges) < range_stop:
            nxt = remaining.popleft()
            if nxt is None:
                if remaining:
                    level += 1
                    remaining.append(None)
            else:
                check_value(nxt, level)

        while remaining:
            el = remaining.popleft()
            if el is None:
                level += 1
            else:
                lo, hi = self._sequence_interval(el[0], el[1], el[2], level, partial=False)
                ranges.append(IndexRange(lo, hi, False))

        ranges.sort(key=lambda r: (r.lower, r.upper))
        result: list[IndexRange] = []
        current = ranges[0]
        for rng in ranges[1:]:
            if rng.lower <= current.upper + 1:
                current = IndexRange(current.lower, max(current.upper, rng.upper),
                                     current.contained and rng.contained)
            else:
                result.append(current)
                current = rng
        result.append(current)
        return result
