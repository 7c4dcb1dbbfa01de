"""Type-inference ingest, SFT spec strings, routed views, CRS round-trip."""

import pytest
from pyspark.sql import functions as F

from geomesa_spark.functions import crs
from geomesa_spark.sources.ingest import RoutedView, infer_csv

CSV = """name,dtg,geom,count,score
alpha,2024-01-01T00:00:00,POINT (10 20),3,1.5
beta,2024-01-02T12:30:00,POINT (-40 5),7,2.25
gamma,2024-01-03T06:15:00,POINT (120 -33),1,0.5
"""


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "feats.csv"
    p.write_text(CSV)
    return str(p)


def test_infer_csv_types_and_spec(spark, csv_path):
    df, spec = infer_csv(spark, csv_path)
    assert spec == ("name:String,dtg:Date,*geom:Point:srid=4326,"
                    "count:Integer,score:Double")
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert schema["dtg"] == "timestamp"
    assert schema["count"] == "int"
    assert schema["score"] == "double"
    assert schema["geom"] == "string"   # WKT payload column
    assert df.count() == 3


def test_infer_csv_mixed_geometries(spark, tmp_path):
    p = tmp_path / "mixed.csv"
    p.write_text('g\n"POINT (0 0)"\n"POLYGON ((0 0, 1 0, 1 1, 0 0))"\n')
    _, spec = infer_csv(spark, str(p))
    assert spec == "*g:Geometry:srid=4326"


def test_routed_view(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    view = RoutedView([({"event_type", "user_id"}, ev), ({"lang"}, docs)],
                      default=ev)
    assert view.route({"user_id"}) is ev
    assert view.route({"lang"}) is docs
    assert view.route({"unknown"}) is ev
    n = view.query("event_type = 'error'", {"event_type"}).count()
    assert n == ev.where("event_type = 'error'").count()


def test_mercator_round_trip(spark, sf_dir):
    from geomesa_spark.sources.testdata import geo_events
    df = geo_events(spark, sf_dir).limit(500)
    merc = crs.reproject_4326_to_3857(df)
    back = crs.reproject_3857_to_4326(
        merc.select("event_id", "x", "y",
                    F.col("lon").alias("lon0"), F.col("lat").alias("lat0")))
    bad = back.where(
        (F.abs(F.col("lon") - F.col("lon0")) > 1e-9)
        | ((F.abs(F.col("lat") - F.col("lat0")) > 1e-9)
           & (F.abs("lat0") < crs.MAX_LAT))).count()
    assert bad == 0
