"""Oracle-parity comparison helpers shared by tests/test_oracle_parity.py
and scripts/parity_check.py.

The driver's CORRECTNESS gate hashes sorted values, so it is EXACT on every
column. The local harness must match that strictness on non-float dtypes:
a relative tolerance on int64 silently accepts ±rtol*value — that is ±1.7 s
on epoch-seconds and ±4.6e9 on 62-bit z-values, exactly the large-integer
outputs this engine produces (cell ids, ppm-scaled measures, epochs).
Floats keep a tolerance because Spark and DuckDB legitimately differ in
summation order.
"""

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, unify int widths, round floats, sort rows —
    mirrors the driver's order-insensitive value comparison."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        # unify int-like columns across engines (int32 vs int64)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def assert_frames_match(got: pd.DataFrame, want: pd.DataFrame,
                        name: str = "") -> None:
    """Exact on non-float columns, rtol/atol=1e-9 on float columns.

    Both frames must already be normalized (same column order, row order
    canonical). Raises AssertionError with a per-column diff summary.
    """
    if list(got.columns) != list(want.columns):
        raise AssertionError(
            f"{name}: columns {list(got.columns)} != {list(want.columns)}")
    if len(got) != len(want):
        raise AssertionError(f"{name}: rows {len(got)} != {len(want)}")
    # HARD-FAIL on int-vs-float dtype mismatch BEFORE any tolerance branch.
    # The driver hashes raw values, so int64 494788013 vs float64 494788013.0
    # is a driver failure even though the values are numerically identical
    # (this exact class escaped the local gate in rounds 3 AND 4 — DuckDB
    # HUGEINT/DECIMAL outputs materialize as float64 in pandas).
    for c in got.columns:
        g_int = pd.api.types.is_integer_dtype(got[c])
        w_int = pd.api.types.is_integer_dtype(want[c])
        g_flt = pd.api.types.is_float_dtype(got[c])
        w_flt = pd.api.types.is_float_dtype(want[c])
        if (g_int and w_flt) or (g_flt and w_int):
            raise AssertionError(
                f"{name}: column {c!r}: dtype KIND mismatch — got "
                f"{got[c].dtype}, want {want[c].dtype}. The driver's exact "
                f"hash fails on int-vs-float even when values are equal; "
                f"if the oracle side is float, the SQL likely returns "
                f"HUGEINT/DECIMAL (e.g. sum(BIGINT)) — cast it to BIGINT.")
    float_cols = [c for c in got.columns
                  if pd.api.types.is_float_dtype(got[c])
                  or pd.api.types.is_float_dtype(want[c])]
    exact_cols = [c for c in got.columns if c not in float_cols]
    if exact_cols:
        for c in exact_cols:
            g, w = got[c], want[c]
            mism = ~((g == w) | (g.isna() & w.isna()))
            n_bad = int(mism.sum())
            if n_bad:
                i = mism.idxmax()
                raise AssertionError(
                    f"{name}: column {c!r}: {n_bad}/{len(g)} values differ "
                    f"(first at row {i}: got {g[i]!r}, want {w[i]!r})")
    if float_cols:
        pd.testing.assert_frame_equal(
            got[float_cols], want[float_cols], check_dtype=False,
            check_exact=False, rtol=1e-9, atol=1e-9, obj=name or "frame")
