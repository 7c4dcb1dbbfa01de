#!/usr/bin/env python
"""Fast oracle-parity iteration tool: runs selected queries() entries against
their DuckDB oracles at a given sf dir and diffs the normalized frames.

Usage: python scripts/parity_check.py [sf_dir] [name ...]
"""

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as m
    qs, osql = m.queries(), m.oracle_sql()
    names = sys.argv[2:] or sorted(osql)

    from geomesa_spark.session import get_spark
    spark = get_spark("parity", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name in names:
        try:
            got = normalize(qs[name](spark, sf_dir).toPandas())
            want = normalize(con.execute(osql[name]).df())
            if list(got.columns) != list(want.columns):
                raise AssertionError(f"cols {list(got.columns)} != {list(want.columns)}")
            if len(got) != len(want):
                raise AssertionError(f"rows {len(got)} != {len(want)}")
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=False, rtol=1e-9, atol=1e-9)
            print(f"OK    {name}  ({len(got)} rows)")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"FAIL  {name}: {str(e)[:500]}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
