"""XZ2 curve for spatial extents (non-point geometries).

Implements XZ-Ordering ("XZ-Ordering: A Space-Filling Curve for Objects with
Spatial Extension", Böhm/Klump/Kriegel, SSD 1999) with the same conventions as
the reference (curve/XZ2SFC.scala): an object's bbox is normalized to [0,1]²,
the sequence-code length is chosen from the bbox's max dimension (l1 or l1+1
via the two-cell predicate, §4.1 of the paper), and covers enumerate quad
elements whose *extended* (2x) footprint intersects the query.

Sequence codes are quaternary path prefixes mapped to longs via
``cs += 1 + q*(4^(g-i) - 1)/3`` at each level (Definition 2 of the paper).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass
from math import floor, log

import numpy as np

from geomesa_spark.cells.zn import DEFAULT_MAX_RANGES, IndexRange

_LOG_HALF = log(0.5)


@dataclass(frozen=True)
class _QueryWindow:
    xmin: float
    ymin: float
    xmax: float
    ymax: float


class XZ2SFC:
    def __init__(self, g: int, x_bounds: tuple[float, float] = (-180.0, 180.0),
                 y_bounds: tuple[float, float] = (-90.0, 90.0)):
        self.g = g
        self.xlo, self.xhi = x_bounds
        self.ylo, self.yhi = y_bounds
        self.xsize = self.xhi - self.xlo
        self.ysize = self.yhi - self.ylo
        # 4^k values for k = 0..g (python ints, no overflow)
        self._pow4 = [4 ** k for k in range(g + 2)]

    # -- normalization ------------------------------------------------------

    def _normalize(self, xmin, ymin, xmax, ymax, lenient=False):
        if xmin > xmax or ymin > ymax:
            raise ValueError(f"bounds must be ordered: [{xmin} {xmax}] [{ymin} {ymax}]")
        if not (self.xlo <= xmin and xmax <= self.xhi and self.ylo <= ymin and ymax <= self.yhi):
            if not lenient:
                raise ValueError(f"values out of bounds: [{xmin} {xmax}] [{ymin} {ymax}]")
            xmin = min(max(xmin, self.xlo), self.xhi)
            xmax = min(max(xmax, self.xlo), self.xhi)
            ymin = min(max(ymin, self.ylo), self.yhi)
            ymax = min(max(ymax, self.ylo), self.yhi)
        return ((xmin - self.xlo) / self.xsize, (ymin - self.ylo) / self.ysize,
                (xmax - self.xlo) / self.xsize, (ymax - self.ylo) / self.ysize)

    # -- indexing -----------------------------------------------------------

    def index(self, xmin: float, ymin: float, xmax: float, ymax: float,
              lenient: bool = False) -> int:
        nxmin, nymin, nxmax, nymax = self._normalize(xmin, ymin, xmax, ymax, lenient)
        max_dim = max(nxmax - nxmin, nymax - nymin)
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

                length = l1 + 1 if predicate(nxmin, nxmax) and predicate(nymin, nymax) else l1
        return self._sequence_code(nxmin, nymin, length)

    def index_np(self, xmin: np.ndarray, ymin: np.ndarray, xmax: np.ndarray,
                 ymax: np.ndarray) -> np.ndarray:
        """Vectorized (lenient) index over bbox arrays."""
        nxmin = (np.clip(xmin, self.xlo, self.xhi) - self.xlo) / self.xsize
        nxmax = (np.clip(xmax, self.xlo, self.xhi) - self.xlo) / self.xsize
        nymin = (np.clip(ymin, self.ylo, self.yhi) - self.ylo) / self.ysize
        nymax = (np.clip(ymax, self.ylo, self.yhi) - self.ylo) / self.ysize
        max_dim = np.maximum(nxmax - nxmin, nymax - nymin)
        with np.errstate(divide="ignore"):
            l1 = np.where(max_dim > 0,
                          np.floor(np.log(np.maximum(max_dim, 1e-300)) / _LOG_HALF), self.g)
        l1 = np.minimum(l1, self.g).astype(np.int64)
        w2 = np.power(0.5, (l1 + 1).astype(np.float64))
        pred = ((nxmax <= np.floor(nxmin / w2) * w2 + 2 * w2)
                & (nymax <= np.floor(nymin / w2) * w2 + 2 * w2))
        length = np.where((l1 < self.g) & pred, l1 + 1, l1)
        length = np.minimum(length, self.g)

        # iterative quaternary sequence code, vectorized across rows
        n = len(length)
        cs = np.zeros(n, dtype=np.int64)
        cur_xmin = np.zeros(n); cur_ymin = np.zeros(n)
        cur_xmax = np.ones(n); cur_ymax = np.ones(n)
        pow4 = np.array(self._pow4[: self.g + 1], dtype=np.int64)
        for i in range(int(length.max()) if n else 0):
            active = i < length
            xc = (cur_xmin + cur_xmax) / 2.0
            yc = (cur_ymin + cur_ymax) / 2.0
            qx = (nxmin >= xc)
            qy = (nymin >= yc)
            q = qx.astype(np.int64) + 2 * qy.astype(np.int64)
            step = 1 + q * ((pow4[self.g - i] - 1) // 3)
            cs = np.where(active, cs + step, cs)
            cur_xmax = np.where(active & ~qx, xc, cur_xmax)
            cur_xmin = np.where(active & qx, xc, cur_xmin)
            cur_ymax = np.where(active & ~qy, yc, cur_ymax)
            cur_ymin = np.where(active & qy, yc, cur_ymin)
        return cs

    def _sequence_code(self, x: float, y: float, length: int) -> int:
        xmin, ymin, xmax, ymax = 0.0, 0.0, 1.0, 1.0
        cs = 0
        for i in range(length):
            xc = (xmin + xmax) / 2.0
            yc = (ymin + ymax) / 2.0
            q = (0 if x < xc else 1) + (0 if y < yc else 2)
            cs += 1 + q * ((self._pow4[self.g - i] - 1) // 3)
            if x < xc:
                xmax = xc
            else:
                xmin = xc
            if y < yc:
                ymax = yc
            else:
                ymin = yc
        return cs

    def _sequence_interval(self, x: float, y: float, length: int, partial: bool) -> tuple[int, int]:
        lo = self._sequence_code(x, y, length)
        hi = lo if partial else lo + (self._pow4[self.g - length + 1] - 1) // 3
        return lo, hi

    # -- covers -------------------------------------------------------------

    def ranges(self, queries: list[tuple[float, float, float, float]],
               max_ranges: int | None = None) -> list[IndexRange]:
        windows = [_QueryWindow(*self._normalize(*q)) for q in queries]
        return self._ranges(windows, max_ranges if max_ranges is not None else DEFAULT_MAX_RANGES)

    def _ranges(self, query: list[_QueryWindow], range_stop: int) -> list[IndexRange]:
        ranges: list[IndexRange] = []
        # element = (xmin, ymin, xmax, ymax, length); extended footprint adds
        # +length to xmax/ymax
        remaining: deque[tuple | None] = deque()

        def is_contained(el) -> bool:
            xmin, ymin, xmax, ymax, ln = el
            return any(w.xmin <= xmin and w.ymin <= ymin and w.xmax >= xmax + ln
                       and w.ymax >= ymax + ln for w in query)

        def is_overlapped(el) -> bool:
            xmin, ymin, xmax, ymax, ln = el
            return any(w.xmax >= xmin and w.ymax >= ymin and w.xmin <= xmax + ln
                       and w.ymin <= ymax + ln for w in query)

        def children(el):
            xmin, ymin, xmax, ymax, ln = el
            xc, yc, half = (xmin + xmax) / 2.0, (ymin + ymax) / 2.0, ln / 2.0
            return ((xmin, ymin, xc, yc, half), (xc, ymin, xmax, yc, half),
                    (xmin, yc, xc, ymax, half), (xc, yc, xmax, ymax, half))

        def check_value(el, level: int) -> None:
            if is_contained(el):
                lo, hi = self._sequence_interval(el[0], el[1], level, partial=False)
                ranges.append(IndexRange(lo, hi, True))
            elif is_overlapped(el):
                lo, hi = self._sequence_interval(el[0], el[1], level, partial=True)
                ranges.append(IndexRange(lo, hi, False))
                for c in children(el):
                    remaining.append(c)

        for c in children((0.0, 0.0, 1.0, 1.0, 1.0)):
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
                lo, hi = self._sequence_interval(el[0], el[1], level, partial=False)
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
