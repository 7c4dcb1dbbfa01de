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


def __getattr__(name: str):
    if name in FUNCTIONS:
        fn = _make(name)
        globals()[name] = fn  # cache
        return fn
    raise AttributeError(name)


def __dir__():
    return __all__
