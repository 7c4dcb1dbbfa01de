"""Typed column-function bindings for the ST_* surface.

Parity with the reference's Python bindings
(geomesa-spark/geomesa_pyspark/src/main/python/geomesa_pyspark/scala/
functions.py), where every SQL-registered ST_* function is also a typed
column function: ``from geomesa_spark.functions import api as st;
df.select(st.st_contains(st.st_geomFromWKT(F.lit(wkt)), df.geom))``.

Functions are generated from the same registration table as the SQL
surface (st_functions.FUNCTIONS), so both APIs stay in lockstep.
"""

from __future__ import annotations

import inspect

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from geomesa_spark.functions.st_functions import FUNCTIONS

__all__ = sorted(FUNCTIONS)


def _make(name: str):
    fn, rtype = FUNCTIONS[name]
    params = inspect.signature(fn).parameters
    fn.__annotations__ = {p: pd.Series for p in params}
    fn.__annotations__["return"] = pd.Series
    udf = F.pandas_udf(fn, rtype)

    def column_fn(*cols) -> Column:
        return udf(*[c if isinstance(c, Column) else F.lit(c) for c in cols])

    column_fn.__name__ = name
    column_fn.__qualname__ = name
    column_fn.__doc__ = f"Column form of the SQL function `{name}`."
    return column_fn


def _make_convexhull():
    """st_convexhull is an AGGREGATE (grouped-agg pandas UDF), not a row
    function — usable in groupBy().agg() like any built-in aggregate."""
    from geomesa_spark.functions.st_functions import _convex_hull_agg_fn
    _convex_hull_agg_fn.__annotations__ = {"geoms": pd.Series,
                                           "return": bytes}
    udf = F.pandas_udf(_convex_hull_agg_fn, "binary")

    def column_fn(col) -> Column:
        return udf(col if isinstance(col, Column) else F.col(col))

    column_fn.__name__ = column_fn.__qualname__ = "st_convexhull"
    column_fn.__doc__ = "Aggregate column form of `st_convexhull`."
    return column_fn


def __getattr__(name: str):
    if name in FUNCTIONS:
        fn = _make(name)
        globals()[name] = fn  # cache
        return fn
    if name == "st_convexhull":
        fn = _make_convexhull()
        globals()[name] = fn
        return fn
    raise AttributeError(name)


def __dir__():
    return __all__
