"""Filter-corpus fixture table (FIXTURES.md F3, mirrors accumulo TestData):
~1000 seeded rows with mixed Point/LineString/Polygon geometry clustered near
POLYGON ((45 23, 48 23, 48 27, 45 27, 45 23)), string attribute, temporal
attributes, feature ids '|data|1xxxxx'."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from geomesa_spark.geom import model
from geomesa_spark.geom.wkb import wkb_dumps


def features_pdf(n: int = 1000, seed: int = 42) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    kinds = rng.choice(["point", "line", "poly"], size=n, p=[0.8, 0.1, 0.1])
    # 70% clustered near the reference polygon, 30% global
    clustered = rng.rand(n) < 0.7
    lon = np.where(clustered, rng.uniform(43.0, 50.0, n), rng.uniform(-180, 180, n))
    lat = np.where(clustered, rng.uniform(21.0, 29.0, n), rng.uniform(-90, 90, n))

    geoms, gtypes = [], []
    for i in range(n):
        x, y = lon[i], lat[i]
        if kinds[i] == "point":
            g = model.Point(x, y)
        elif kinds[i] == "line":
            dx, dy = rng.uniform(0.2, 1.5, 2)
            g = model.LineString([[x - dx, y - dy], [x, y], [x + dx, y + dy / 2]])
        else:
            d = rng.uniform(0.2, 1.2)
            g = model.box(x - d, y - d, min(x + d, 180.0), min(y + d, 90.0))
        geoms.append(wkb_dumps(g))
        gtypes.append(g.geom_type)

    dtg = pd.to_datetime("2010-07-01") + pd.to_timedelta(
        rng.randint(0, 62 * 24 * 3600, n), unit="s")
    return pd.DataFrame({
        "__fid__": [f"|data|{100000 + i}" for i in range(n)],
        "attr2": [f"2nd{100000 + i}" if i < 20 else f"val{i % 100}" for i in range(n)],
        "geom": geoms,
        "geom_type": gtypes,
        "lon": lon,
        "lat": lat,
        "dtg": dtg,
        "dtg_end_time": dtg + pd.Timedelta(hours=2),
    })


def features_df(spark: SparkSession, n: int = 1000, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(features_pdf(n, seed))
