"""Ingest helpers: type-inference over delimited/JSON text, SFT spec strings.

Reference parity:
* TypeInference (geomesa-convert-common convert2/TypeInference.scala): sample
  string columns and promote them to timestamps / WKT geometries / numbers.
* SimpleFeatureTypes spec strings ("name:String,dtg:Date,*geom:Point:srid=4326",
  geomesa-utils SimpleFeatureTypes.scala): emitted for the inferred schema so
  a reference user sees the familiar surface.

Spark does the base inference (`inferSchema`); this adds the geo-specific
passes the converter DSL performs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_spark.geom import wkt as wktmod

_SFT_NAMES = {
    T.StringType(): "String", T.IntegerType(): "Integer", T.LongType(): "Long",
    T.DoubleType(): "Double", T.FloatType(): "Float", T.BooleanType(): "Boolean",
    T.TimestampType(): "Date", T.BinaryType(): "Bytes",
}

_GEOM_TYPES = {"Point", "LineString", "Polygon", "MultiPoint",
               "MultiLineString", "MultiPolygon"}


def _all_parse_wkt(values: list) -> str | None:
    kinds = set()
    for v in values:
        if v is None:
            continue
        try:
            kinds.add(wktmod.wkt_loads(v).geom_type)
        except Exception:
            return None
    if not kinds:
        return None
    return kinds.pop() if len(kinds) == 1 else "Geometry"


def infer_csv(spark: SparkSession, path: str, sample_rows: int = 100,
              header: bool = True) -> tuple[DataFrame, str]:
    """Read a CSV with full type inference (numbers/booleans via Spark,
    timestamps and WKT geometry via sampling). Returns (df, sft_spec).

    Geometry columns stay WKT strings with a parsed-type annotation in the
    spec (the engine's geometry payloads are WKT/WKB columns; see SURVEY
    §1.2); the first geometry column is the default (starred) one.
    """
    df = (spark.read.option("header", str(header).lower())
          .option("inferSchema", "true")
          .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]")
          .csv(path))
    sample = df.limit(sample_rows).collect()

    geom_cols: dict[str, str] = {}
    ts_cols: list[str] = []
    for field in df.schema.fields:
        if not isinstance(field.dataType, T.StringType):
            continue
        values = [r[field.name] for r in sample]
        kind = _all_parse_wkt(values)
        if kind in _GEOM_TYPES or kind == "Geometry":
            geom_cols[field.name] = kind
            continue
        parsed = [v for v in values if v is not None]
        if parsed:
            # try_to_timestamp: ANSI mode makes to_timestamp THROW on
            # non-timestamp strings instead of returning null
            ts_probe = spark.createDataFrame([(v,) for v in parsed], "v string") \
                .select(F.expr("try_to_timestamp(v)").alias("t")).collect()
            if all(r.t is not None for r in ts_probe):
                ts_cols.append(field.name)

    for c in ts_cols:
        df = df.withColumn(c, F.to_timestamp(c))

    parts = []
    starred = False
    for field in df.schema.fields:
        name = field.name
        if name in geom_cols:
            star = "" if starred else "*"
            starred = True
            parts.append(f"{star}{name}:{geom_cols[name]}:srid=4326")
        else:
            parts.append(f"{name}:{_SFT_NAMES.get(field.dataType, 'String')}")
    return df, ",".join(parts)


class RoutedView:
    """Route each query to exactly one store by its filter attributes.

    Reference: RouteSelectorByAttribute (geomesa-index-api view/
    RouteSelectorByAttribute.scala) — stores register the attributes they
    index; a query routes to the first store covering one of its filter
    attributes, else to the default store.
    """

    def __init__(self, routes: list[tuple[set, DataFrame]],
                 default: DataFrame | None = None):
        self.routes = [(set(attrs), df) for attrs, df in routes]
        self.default = default

    def route(self, filter_attributes: set) -> DataFrame:
        for attrs, df in self.routes:
            if attrs & set(filter_attributes):
                return df
        if self.default is not None:
            return self.default
        raise ValueError(f"no route for attributes {sorted(filter_attributes)}")

    def query(self, where: str, filter_attributes: set) -> DataFrame:
        return self.route(filter_attributes).where(where)
