"""Z2 space-filling curve (2-D lon/lat, 31 bits per dimension).

Semantics match the reference (zorder/sfcurve/Z2.scala, curve/Z2SFC.scala,
curve/NormalizedDimension.scala): dimensions are normalized to
``floor((x - min) * 2^p / (max - min))`` with the upper bound clamped to
``2^p - 1``, then bit-interleaved x-first (x in even bits).
"""

from __future__ import annotations

import numpy as np

from geomesa_spark.cells import zn


class NormalizedDimension:
    """Maps a double in [min,max] to an int in [0, 2^precision)."""

    def __init__(self, lo: float, hi: float, precision: int):
        if not (0 < precision < 32):
            raise ValueError("precision must be in [1,31]")
        self.min, self.max, self.precision = lo, hi, precision
        self.bins = 1 << precision
        self.normalizer = self.bins / (hi - lo)
        self.denormalizer = (hi - lo) / self.bins
        self.max_index = self.bins - 1

    def normalize(self, x: float) -> int:
        if x >= self.max:
            return self.max_index
        return int(np.floor((x - self.min) * self.normalizer))

    def denormalize(self, x: int) -> float:
        if x >= self.max_index:
            return self.min + (self.max_index + 0.5) * self.denormalizer
        return self.min + (x + 0.5) * self.denormalizer

    def normalize_np(self, x: np.ndarray) -> np.ndarray:
        out = np.floor((x - self.min) * self.normalizer).astype(np.int64)
        return np.where(x >= self.max, self.max_index, out).astype(np.uint64)

    def denormalize_np(self, x: np.ndarray) -> np.ndarray:
        xi = np.minimum(x.astype(np.float64), float(self.max_index))
        return self.min + (xi + 0.5) * self.denormalizer


def NormalizedLon(precision: int) -> NormalizedDimension:
    return NormalizedDimension(-180.0, 180.0, precision)


def NormalizedLat(precision: int) -> NormalizedDimension:
    return NormalizedDimension(-90.0, 90.0, precision)


class Z2:
    """Raw interleave: Z2(x, y) with bits ...y1x1y0x0."""

    @staticmethod
    def encode(x: int, y: int) -> int:
        return zn.split2(x) | (zn.split2(y) << 1)

    @staticmethod
    def decode(z: int) -> tuple[int, int]:
        return zn.combine2(z), zn.combine2(z >> 1)

    @staticmethod
    def encode_np(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        return zn.split2_np(x) | (zn.split2_np(y) << np.uint64(1))

    @staticmethod
    def decode_np(z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return zn.combine2_np(z), zn.combine2_np(z >> np.uint64(1))


class Z2SFC:
    """Lon/lat curve at a given precision (default 31 bits/dim, 62-bit z)."""

    def __init__(self, precision: int = 31):
        self.precision = precision
        self.lon = NormalizedLon(precision)
        self.lat = NormalizedLat(precision)

    def index(self, x: float, y: float, lenient: bool = False) -> int:
        if not (self.lon.min <= x <= self.lon.max and self.lat.min <= y <= self.lat.max):
            if not lenient:
                raise ValueError(f"value(s) out of bounds: {x}, {y}")
            x = min(max(x, self.lon.min), self.lon.max)
            y = min(max(y, self.lat.min), self.lat.max)
        return Z2.encode(self.lon.normalize(x), self.lat.normalize(y))

    def index_np(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Vectorized lenient index (values clamped to bounds)."""
        xc = np.clip(x, self.lon.min, self.lon.max)
        yc = np.clip(y, self.lat.min, self.lat.max)
        return Z2.encode_np(self.lon.normalize_np(xc), self.lat.normalize_np(yc))

    def invert(self, z: int) -> tuple[float, float]:
        x, y = Z2.decode(z)
        return self.lon.denormalize(x), self.lat.denormalize(y)

    def ranges(self, xy: list[tuple[float, float, float, float]],
               precision: int = 64, max_ranges: int | None = None) -> list[zn.IndexRange]:
        """Cover the OR'd lon/lat boxes with z ranges."""
        zbounds = [(self.index(xmin, ymin), self.index(xmax, ymax))
                   for (xmin, ymin, xmax, ymax) in xy]
        return zn.zranges(zbounds, precision, max_ranges, dims=2)


Z2SFC_DEFAULT = Z2SFC(31)
