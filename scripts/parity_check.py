#!/usr/bin/env python
"""Fast oracle-parity iteration tool: runs selected queries() entries against
their DuckDB oracles at a given sf dir and diffs the normalized frames.

Usage: python scripts/parity_check.py [sf_dir] [name ...]
"""

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from geomesa_spark.testing import assert_frames_match, normalize  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


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
            assert_frames_match(got, want, name)
            print(f"OK    {name}  ({len(got)} rows)")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"FAIL  {name}: {str(e)[:500]}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
