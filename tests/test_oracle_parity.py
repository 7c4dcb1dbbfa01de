"""Driver-gate rehearsal: run every queries() entry through Spark AND its
DuckDB oracle on the same parquet tables, compare row counts + sorted values.

This mirrors what the driver does for CORRECTNESS_r{N}.json (order-insensitive
value comparison after sorting columns by name).
"""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from geomesa_spark.testing import assert_frames_match, normalize as _normalize

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


QUERY_NAMES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]

    got = _normalize(q(spark, sf_dir).toPandas())
    want = _normalize(duck.execute(sql).df())

    assert_frames_match(got, want, name)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_oracle_output_types_lint(duck, name):
    """No oracle may emit HUGEINT/DECIMAL columns: pandas materializes both
    as float64 (or object), so the driver's exact hash fails against Spark's
    int64 even when values are identical — this is exactly how tile_render
    went red in round 4 (sum(BIGINT) -> HUGEINT -> 494788013.0 != 494788013).
    Catch it at authoring time by inspecting the relation's declared types."""
    sql = entry_mod.oracle_sql()[name]
    rel = duck.sql(sql)
    bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
           if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()]
    assert not bad, (
        f"{name}: oracle emits pandas-float-coercing types {bad}; "
        f"wrap with cast(... as bigint)/cast(... as double) in the SQL")


def test_harness_catches_int_vs_float_dtype_mismatch():
    """The r4 blind spot: an int64 column on one side and float64 on the
    other was demoted to tolerance comparison, so numerically-equal values
    passed locally while the driver's exact hash failed. Prove the harness
    now hard-fails on the dtype-kind mismatch itself."""
    a = _normalize(pd.DataFrame({"id": [1, 2], "chk": [494788013, 7]}))
    b = a.copy()
    b["chk"] = b["chk"].astype("float64")  # numerically identical values
    with pytest.raises(AssertionError, match="dtype KIND mismatch"):
        assert_frames_match(a, b, "int_vs_float")
    with pytest.raises(AssertionError, match="dtype KIND mismatch"):
        assert_frames_match(b, a, "float_vs_int")


def test_harness_catches_integer_perturbation():
    """The r3 blind spot: rtol on int64 tolerated ±1 on epoch-seconds.
    Prove the harness now rejects a deliberate ±1 integer perturbation."""
    a = _normalize(pd.DataFrame({"id": [1, 2, 3],
                                 "epoch": [1704197032, 1704197033, 1704197034]}))
    b = a.copy()
    b.loc[1, "epoch"] += 1
    assert_frames_match(a, a.copy(), "self")
    with pytest.raises(AssertionError, match="epoch"):
        assert_frames_match(a, b, "perturbed")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"zoom", "n_pixels", "n_points"} <= set(df.columns)
