"""Function-surface tests: native cell expressions vs the Python cell library,
and ST_* UDF behavior through Spark SQL (mirrors geomesa-spark-jts udf tests)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.cells.grid import cell_id
from geomesa_spark.cells.z2 import Z2SFC
from geomesa_spark.cells.z3 import BinnedTime, Z3SFC
from geomesa_spark.functions.cell_functions import (cell_col, pixel_cols,
                                                    tile_cols, time_bin_col,
                                                    z2_col, z3_col)
from geomesa_spark.geom import wkb_loads, wkt_loads
from geomesa_spark.geom.wkb import wkb_dumps


@pytest.fixture(scope="module")
def points_df(spark):
    rng = np.random.RandomState(11)
    pdf = pd.DataFrame({
        "lon": rng.uniform(-179.9, 179.9, 500),
        "lat": rng.uniform(-89.9, 89.9, 500),
        "ts": pd.to_datetime(rng.randint(1_500_000_000, 1_700_000_000, 500), unit="s", utc=True),
    })
    return spark.createDataFrame(pdf), pdf


class TestNativeCellExprs:
    def test_z2_col_matches_library(self, points_df):
        df, pdf = points_df
        got = df.select(z2_col(F.col("lon"), F.col("lat")).alias("z")).toPandas()["z"].to_numpy()
        sfc = Z2SFC(31)
        expected = np.array([sfc.index(x, y) for x, y in zip(pdf.lon, pdf.lat)], dtype=np.int64)
        np.testing.assert_array_equal(got, expected)

    def test_z3_col_matches_library(self, points_df):
        df, pdf = points_df
        got = df.select(
            time_bin_col(F.col("ts"), "week").alias("bin"),
            z3_col(F.col("lon"), F.col("lat"), F.col("ts"), "week").alias("z"),
        ).toPandas()
        sfc = Z3SFC("week")
        millis = (pdf.ts.astype("int64") // 1_000_000).to_numpy()
        for i in range(0, len(pdf), 37):
            bt = BinnedTime.to_binned_time(int(millis[i]), "week")
            assert got["bin"][i] == bt.bin
            assert got["z"][i] == sfc.index(pdf.lon[i], pdf.lat[i], bt.offset)

    def test_cell_col_matches_library(self, points_df):
        df, pdf = points_df
        got = df.select(cell_col(F.col("lon"), F.col("lat"), 12).alias("c")).toPandas()["c"]
        for i in range(0, len(pdf), 41):
            assert got[i] == cell_id(pdf.lon[i], pdf.lat[i], 12)

    def test_tile_and_pixel(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"lon": [0.0, -180.0, 179.9], "lat": [0.0, -90.0, 89.9]}))
        tx, ty = tile_cols(F.col("lon"), F.col("lat"), 2)
        px, py = pixel_cols(F.col("lon"), F.col("lat"), -180, -90, 180, 90, 256, 256)
        r = df.select(tx.alias("tx"), ty.alias("ty"), px.alias("px"), py.alias("py")).collect()
        assert (r[0].tx, r[0].ty) == (2, 2)
        assert (r[1].tx, r[1].ty) == (0, 0)
        assert (r[2].tx, r[2].ty) == (3, 3)
        assert (r[1].px, r[1].py) == (0, 0)
        assert (r[2].px, r[2].py) == (255, 255)

    def test_whole_stage_codegen(self, spark, sf_dir):
        # over a real parquet scan (not a folded local relation) the cell
        # assignment must stay inside whole-stage codegen — no Python eval
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        proj = df.select(z2_col(F.col("value") % 360 - 180, F.col("value") % 180 - 90).alias("z"))
        plan = proj._jdf.queryExecution().executedPlan().toString()
        assert plan.startswith("*(")  # whole-stage codegen: no Python eval node
        assert "EvalPython" not in plan
        assert "ReadSchema: struct<value:double>" in plan  # column pruning reached the scan


class TestSTFunctions:
    def test_constructors_and_outputs(self, spark):
        row = spark.sql("""
            SELECT st_asText(st_geomFromWKT('POINT (1 2)')) AS wkt,
                   st_x(st_makePoint(3.5, -4.5)) AS x,
                   st_y(st_makePoint(3.5, -4.5)) AS y,
                   st_asText(st_makeBBOX(0, 0, 1, 1)) AS bbox,
                   st_geometryType(st_geomFromWKT('LINESTRING (0 0, 1 1)')) AS gt
        """).collect()[0]
        assert row.wkt == "POINT (1 2)"
        assert (row.x, row.y) == (3.5, -4.5)
        assert wkt_loads(row.bbox).area == 1.0
        assert row.gt == "LineString"

    def test_predicates_sql(self, spark):
        row = spark.sql("""
            SELECT st_intersects(st_geomFromWKT('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
                                 st_makePoint(1.0, 1.0)) AS a,
                   st_contains(st_geomFromWKT('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
                               st_makePoint(5.0, 5.0)) AS b,
                   st_within(st_makePoint(1.0, 1.0),
                             st_geomFromWKT('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))')) AS c,
                   st_disjoint(st_makePoint(9.0, 9.0),
                               st_geomFromWKT('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))')) AS d
        """).collect()[0]
        assert (row.a, row.b, row.c, row.d) == (True, False, True, True)

    def test_vectorized_point_fast_path(self, spark):
        # many points vs one constant polygon exercises the numpy kernel
        rng = np.random.RandomState(3)
        pdf = pd.DataFrame({"lon": rng.uniform(40, 50, 2000), "lat": rng.uniform(20, 30, 2000)})
        df = spark.createDataFrame(pdf)
        n = (df.withColumn("g", F.expr("st_makePoint(lon, lat)"))
               .where(F.expr("st_intersects(g, st_geomFromWKT('POLYGON ((45 23, 48 23, 48 27, 45 27, 45 23))'))"))
               .count())
        inside = ((pdf.lon >= 45) & (pdf.lon <= 48) & (pdf.lat >= 23) & (pdf.lat <= 27)).sum()
        assert n == inside

    def test_measures(self, spark):
        row = spark.sql("""
            SELECT st_area(st_geomFromWKT('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')) AS area,
                   st_length(st_geomFromWKT('LINESTRING (0 0, 3 4)')) AS len,
                   st_distance(st_makePoint(0.0, 0.0), st_makePoint(3.0, 4.0)) AS dist,
                   st_distanceSphere(st_makePoint(0.0, 0.0), st_makePoint(1.0, 0.0)) AS dsph,
                   st_asText(st_centroid(st_geomFromWKT('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'))) AS ctr
        """).collect()[0]
        assert row.area == 16.0
        assert row.len == 5.0
        assert row.dist == 5.0
        assert 111_100 < row.dsph < 111_260
        assert row.ctr == "POINT (1 1)"

    def test_geohash_round_trip(self, spark):
        row = spark.sql("""
            SELECT st_geoHash(st_makePoint(-0.1278, 51.5074), 35) AS gh
        """).collect()[0]
        assert row.gh.startswith("gcpv")  # London geohash prefix
        row2 = spark.sql(f"""
            SELECT st_asText(st_pointFromGeoHash('{row.gh}', 35)) AS pt
        """).collect()[0]
        g = wkt_loads(row2.pt)
        assert abs(g.x - (-0.1278)) < 0.1 and abs(g.y - 51.5074) < 0.1

    def test_buffer_point(self, spark):
        row = spark.sql("""
            SELECT st_intersects(st_bufferPoint(st_makePoint(0.0, 0.0), 100000.0),
                                 st_makePoint(0.5, 0.0)) AS near,
                   st_intersects(st_bufferPoint(st_makePoint(0.0, 0.0), 100000.0),
                                 st_makePoint(2.0, 0.0)) AS far
        """).collect()[0]
        assert row.near is True and row.far is False

    def test_envelope_and_boundary(self, spark):
        row = spark.sql("""
            SELECT st_asText(st_envelope(st_geomFromWKT('LINESTRING (0 0, 2 3)'))) AS env,
                   st_numPoints(st_geomFromWKT('LINESTRING (0 0, 1 1, 2 2)')) AS np
        """).collect()[0]
        assert wkt_loads(row.env).bounds == (0.0, 0.0, 2.0, 3.0)
        assert row.np == 3
