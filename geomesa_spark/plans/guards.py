"""Pre-flight query guards (driver-side, cheap).

Spark analogs of the reference's guards
(planning/guard/FullTableScanQueryGuard.scala:39-48, TemporalQueryGuard.scala,
GraduatedQueryGuard.scala): block obviously-unbounded scans before launching
a cluster job.
"""

from __future__ import annotations

from datetime import timedelta


class QueryGuardError(Exception):
    pass


WORLD = (-180.0, -90.0, 180.0, 90.0)


def check_guards(bbox=None, interval=None, *, allow_full_scan: bool = False,
                 max_interval: timedelta | None = None) -> None:
    """Raise QueryGuardError for unbounded queries unless explicitly allowed.

    * no bbox (or whole-world) and no interval -> full-table scan guard
    * interval wider than ``max_interval`` -> temporal guard
    """
    spatial_bounded = bbox is not None and tuple(bbox) != WORLD
    temporal_bounded = interval is not None
    if not spatial_bounded and not temporal_bounded and not allow_full_scan:
        raise QueryGuardError(
            "full-table scan blocked: no spatial or temporal bounds "
            "(pass allow_full_scan=True to override)")
    if temporal_bounded and max_interval is not None:
        lo, hi = interval
        if hi - lo > max_interval:
            raise QueryGuardError(
                f"temporal guard: interval {hi - lo} exceeds {max_interval}")
