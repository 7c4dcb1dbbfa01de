"""Generic N-dimensional Morton (z-order) machinery.

Semantics match the reference row-for-row (golden tests in
``tests/test_cells.py``):

* ``split2/combine2`` — interleave with 1 zero bit (2-D), 31 usable bits
  (reference: zorder/sfcurve/Z2.scala:58-78).
* ``split3/combine3`` — interleave with 2 zero bits (3-D), 21 usable bits
  (reference: zorder/sfcurve/Z3.scala:75-97).
* ``zdivide`` — Tropf/Herzog LITMAX/BIGMIN ("Multidimensional Range Search in
  Dynamically Balanced Trees", H. Tropf & H. Herzog, 1981)
  (reference: zorder/sfcurve/ZN.scala:309-361).
* ``zranges`` — breadth-first quad/oct-tree decomposition of query boxes into
  z ranges with a loose ``max_ranges`` cap and a recursion budget
  (reference: zorder/sfcurve/ZN.scala:110-242; defaults
  geomesa.scan.ranges.target=2000, recurse=7).

Driver-side planning code: pure Python (arbitrary-precision ints, masked to
64 bits). Executor-side encoding is numpy (``*_np`` variants) or native
Catalyst expressions in ``functions/cell_functions.py``.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

import numpy as np

M64 = (1 << 64) - 1

# --- 2-D split/combine (magic-number bit spreading) -------------------------

_MASK2 = 0x7FFFFFFF  # 31 bits per dimension


def split2(value: int) -> int:
    x = value & _MASK2
    x = (x ^ (x << 32)) & 0x00000000FFFFFFFF
    x = (x ^ (x << 16)) & 0x0000FFFF0000FFFF
    x = (x ^ (x << 8)) & 0x00FF00FF00FF00FF
    x = (x ^ (x << 4)) & 0x0F0F0F0F0F0F0F0F
    x = (x ^ (x << 2)) & 0x3333333333333333
    x = (x ^ (x << 1)) & 0x5555555555555555
    return x


def combine2(z: int) -> int:
    x = z & 0x5555555555555555
    x = (x ^ (x >> 1)) & 0x3333333333333333
    x = (x ^ (x >> 2)) & 0x0F0F0F0F0F0F0F0F
    x = (x ^ (x >> 4)) & 0x00FF00FF00FF00FF
    x = (x ^ (x >> 8)) & 0x0000FFFF0000FFFF
    x = (x ^ (x >> 16)) & 0x00000000FFFFFFFF
    return x


# --- 3-D split/combine -------------------------------------------------------

_MASK3 = 0x1FFFFF  # 21 bits per dimension


def split3(value: int) -> int:
    x = value & _MASK3
    x = (x | x << 32) & 0x1F00000000FFFF
    x = (x | x << 16) & 0x1F0000FF0000FF
    x = (x | x << 8) & 0x100F00F00F00F00F
    x = (x | x << 4) & 0x10C30C30C30C30C3
    return (x | x << 2) & 0x1249249249249249


def combine3(z: int) -> int:
    x = z & 0x1249249249249249
    x = (x ^ (x >> 2)) & 0x10C30C30C30C30C3
    x = (x ^ (x >> 4)) & 0x100F00F00F00F00F
    x = (x ^ (x >> 8)) & 0x1F0000FF0000FF
    x = (x ^ (x >> 16)) & 0x1F00000000FFFF
    x = (x ^ (x >> 32)) & _MASK3
    return x


# --- numpy vectorized variants (uint64 arrays) --------------------------------


def split2_np(v: np.ndarray) -> np.ndarray:
    x = v.astype(np.uint64) & np.uint64(_MASK2)
    x = (x ^ (x << np.uint64(32))) & np.uint64(0x00000000FFFFFFFF)
    x = (x ^ (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x ^ (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x ^ (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x ^ (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x ^ (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def combine2_np(z: np.ndarray) -> np.ndarray:
    x = z.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x ^ (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x ^ (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x ^ (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x ^ (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x ^ (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def split3_np(v: np.ndarray) -> np.ndarray:
    x = v.astype(np.uint64) & np.uint64(_MASK3)
    x = (x | x << np.uint64(32)) & np.uint64(0x1F00000000FFFF)
    x = (x | x << np.uint64(16)) & np.uint64(0x1F0000FF0000FF)
    x = (x | x << np.uint64(8)) & np.uint64(0x100F00F00F00F00F)
    x = (x | x << np.uint64(4)) & np.uint64(0x10C30C30C30C30C3)
    return (x | x << np.uint64(2)) & np.uint64(0x1249249249249249)


def combine3_np(z: np.ndarray) -> np.ndarray:
    x = z.astype(np.uint64) & np.uint64(0x1249249249249249)
    x = (x ^ (x >> np.uint64(2))) & np.uint64(0x10C30C30C30C30C3)
    x = (x ^ (x >> np.uint64(4))) & np.uint64(0x100F00F00F00F00F)
    x = (x ^ (x >> np.uint64(8))) & np.uint64(0x1F0000FF0000FF)
    x = (x ^ (x >> np.uint64(16))) & np.uint64(0x1F00000000FFFF)
    x = (x ^ (x >> np.uint64(32))) & np.uint64(_MASK3)
    return x


# --- ranges -------------------------------------------------------------------


@dataclass(frozen=True)
class IndexRange:
    lower: int
    upper: int
    contained: bool  # True when the whole z range lies inside the query box

    def tuple(self) -> tuple[int, int]:
        return (self.lower, self.upper)


class _Dim:
    """Per-dimensionality helpers shared by zdivide/zranges."""

    def __init__(self, dims: int):
        self.dims = dims
        if dims == 2:
            self.split, self.combine = split2, combine2
            self.bits_per_dim, self.total_bits, self.max_mask = 31, 62, _MASK2
        elif dims == 3:
            self.split, self.combine = split3, combine3
            self.bits_per_dim, self.total_bits, self.max_mask = 21, 63, _MASK3
        else:
            raise ValueError(f"unsupported dims {dims}")

    def decode(self, z: int) -> tuple[int, ...]:
        return tuple(self.combine(z >> d) for d in range(self.dims))

    def contains(self, rng: tuple[int, int], value_rng: tuple[int, int]) -> bool:
        rmin, rmax = self.decode(rng[0]), self.decode(rng[1])
        vmin, vmax = self.decode(value_rng[0]), self.decode(value_rng[1])
        return all(vmin[d] >= rmin[d] and vmax[d] <= rmax[d] for d in range(self.dims))

    def overlaps(self, rng: tuple[int, int], value_rng: tuple[int, int]) -> bool:
        rmin, rmax = self.decode(rng[0]), self.decode(rng[1])
        vmin, vmax = self.decode(value_rng[0]), self.decode(value_rng[1])
        return all(max(rmin[d], vmin[d]) <= min(rmax[d], vmax[d]) for d in range(self.dims))

    def load(self, target: int, p: int, bits: int, dim: int) -> int:
        """Overwrite ``bits`` high bits of dimension ``dim`` in ``target`` with ``p``."""
        mask = ~(self.split(self.max_mask >> (self.bits_per_dim - bits)) << dim) & M64
        return (target & mask) | (self.split(p) << dim)


_DIMS = {2: _Dim(2), 3: _Dim(3)}

DEFAULT_RECURSE = 7
DEFAULT_MAX_RANGES = 2000  # geomesa.scan.ranges.target


def zdivide(p: int, rmin: int, rmax: int, dims: int = 2) -> tuple[int, int]:
    """LITMAX/BIGMIN split of range [rmin,rmax] around out-of-box point p."""
    if rmin >= rmax:
        raise ValueError(f"min ({rmin}) must be less than max ({rmax})")
    d = _DIMS[dims]
    zmin, zmax = rmin, rmax
    litmax = bigmin = 0
    for i in range(63, -1, -1):
        bits = i // dims + 1
        dim = i % dims
        xb = (p >> i) & 1
        nb = (zmin >> i) & 1
        xb2 = (zmax >> i) & 1
        if xb == 0 and nb == 0 and xb2 == 1:
            zmax = d.load(zmax, (1 << (bits - 1)) - 1, bits, dim)
            bigmin = d.load(zmin, 1 << (bits - 1), bits, dim)
        elif xb == 0 and nb == 1 and xb2 == 1:
            return litmax, zmin
        elif xb == 1 and nb == 0 and xb2 == 0:
            return zmax, bigmin
        elif xb == 1 and nb == 0 and xb2 == 1:
            litmax = d.load(zmax, (1 << (bits - 1)) - 1, bits, dim)
            zmin = d.load(zmin, 1 << (bits - 1), bits, dim)
    return litmax, bigmin


def zcut(rng: tuple[int, int], xd: int, in_range: bool,
         dims: int = 2) -> list[tuple[int, int]]:
    """Split a z range around a point (ZN.scala:250-265 ``cut``).

    ``in_range``: the point lies inside the query box, so both halves
    exclude it (degenerate single-node cases when it sits on an
    endpoint); otherwise the LITMAX/BIGMIN divide drops the dead span
    between the halves.  An empty list for an uncuttable (single-z)
    range; reversed bounds raise (ZRange's ordering requirement,
    enforced here by zdivide)."""
    rmin, rmax = rng
    if rmin == rmax:
        return []
    if in_range:
        if xd == rmin:
            return [(rmax, rmax)]
        if xd == rmax:
            return [(rmin, rmin)]
        return [(rmin, xd - 1), (xd + 1, rmax)]
    litmax, bigmin = zdivide(xd, rmin, rmax, dims)
    return [(rmin, litmax), (bigmin, rmax)]


def zrange_contains(rng: tuple[int, int], value_rng: tuple[int, int],
                    dims: int = 2) -> bool:
    """ZN.contains: value range's user-space box inside rng's box."""
    return _DIMS[dims].contains(rng, value_rng)


def zrange_overlaps(rng: tuple[int, int], value_rng: tuple[int, int],
                    dims: int = 2) -> bool:
    """ZN.overlaps: user-space boxes of the two z ranges intersect."""
    return _DIMS[dims].overlaps(rng, value_rng)


def _longest_common_prefix(dims: _Dim, *values: int) -> tuple[int, int]:
    bit_shift = dims.total_bits - dims.dims
    head = values[0] >> bit_shift
    while bit_shift > -1 and all((v >> bit_shift) == head for v in values[1:]):
        bit_shift -= dims.dims
        head = values[0] >> bit_shift if bit_shift >= 0 else 0
    bit_shift += dims.dims
    prefix = values[0] & (((1 << 63) - 1) << bit_shift) & M64
    return prefix, 64 - bit_shift


def zranges(zbounds: list[tuple[int, int]], precision: int = 64,
            max_ranges: int | None = None, max_recurse: int | None = DEFAULT_RECURSE,
            dims: int = 2) -> list[IndexRange]:
    """BFS decomposition of z-space query boxes into merged index ranges."""
    d = _DIMS[dims]
    quadrants = 1 << dims
    ranges: list[IndexRange] = []
    remaining: deque[tuple[int, int] | None] = deque()  # None = level terminator

    flat = [v for b in zbounds for v in b]
    common_prefix, common_bits = _longest_common_prefix(d, *flat)
    offset = 64 - common_bits

    def is_contained(rng: tuple[int, int]) -> bool:
        return any(d.contains(b, rng) for b in zbounds)

    def is_overlapped(rng: tuple[int, int]) -> bool:
        return any(d.overlaps(b, rng) for b in zbounds)

    def check_value(prefix: int, quadrant: int) -> None:
        lo = (prefix | (quadrant << offset)) & M64
        hi = (lo | ((1 << offset) - 1)) & M64
        rng = (lo, hi)
        if is_contained(rng) or offset < 64 - precision:
            ranges.append(IndexRange(lo, hi, True))
        elif is_overlapped(rng):
            remaining.append(rng)

    def bottom_out() -> None:
        while remaining:
            mm = remaining.popleft()
            if mm is not None:
                ranges.append(IndexRange(mm[0], mm[1], False))

    check_value(common_prefix, 0)
    remaining.append(None)
    offset -= dims

    level = 0
    range_stop = max_ranges if max_ranges is not None else (1 << 62)
    recurse_stop = max_recurse if max_recurse is not None else DEFAULT_RECURSE

    while remaining:
        nxt = remaining.popleft()
        if nxt is None:
            if remaining:
                level += 1
                offset -= dims
                if level >= recurse_stop or offset < 0:
                    bottom_out()
                else:
                    remaining.append(None)
        else:
            prefix = nxt[0]
            for quadrant in range(quadrants):
                check_value(prefix, quadrant)
            if len(ranges) + len(remaining) - 1 >= range_stop:
                bottom_out()

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
