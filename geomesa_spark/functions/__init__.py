"""Function registration: ST_* pandas UDFs + native cell expressions.

``register_all(spark)`` is the analog of the reference's
``geomesa_pyspark.init_sql(spark)`` (geomesa_pyspark/__init__.py:114): after
it, all ST_* names are usable from ``spark.sql`` and ``F.expr``.
"""

from geomesa_spark.functions import cell_functions  # noqa: F401
from geomesa_spark.functions.cell_functions import (  # noqa: F401
    cell_col, pixel_cols, salt_col, tile_cols, time_bin_col, z2_col, z3_col,
)

_REGISTERED = set()


def register_all(spark) -> None:
    key = id(spark)
    if key in _REGISTERED:
        return
    from geomesa_spark.functions.st_functions import register
    register(spark)
    _REGISTERED.add(key)
