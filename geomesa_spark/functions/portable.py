"""Cross-engine (Spark SQL <-> DuckDB) expression builders for text/vector ops.

The driver's correctness gate hash-compares Spark results against DuckDB
oracle SQL on the same parquet, so every hot-path formula used by the
dedup / text-analysis / ANN operators is emitted in BOTH dialects from the
same Python constants.  All arithmetic is integer (mod 2^31 rolling hashes)
or order-deterministic IEEE-double folds, so both engines produce
bit-identical values.

Design notes (scale): every builder returns a *pure Catalyst expression* on
the Spark side — higher-order functions (transform / filter / aggregate)
that run inside whole-stage codegen.  No Python UDFs in any hot path.

Reference parity: these replace GeoMesa's converter-DSL string/id functions
(geomesa-convert-common convert2/transforms/StringFunctionFactory.scala,
IdFunctionFactory.scala: md5/murmur3_32 used for feature-id hashing) with
engine-portable equivalents.
"""

from __future__ import annotations

P31 = 2147483647           # 2^31 - 1, Mersenne prime modulus
FOLD_INIT = 7              # rolling-hash seed
FOLD_MULT = 31             # polynomial base (java-String-hash style)
SHINGLE_MULT = 1000003     # combine multiplier for token-hash n-grams

# MinHash: k permutation hashes h_j(x) = (A[j]*x + B[j]) mod P31
MINHASH_K = 16
MINHASH_A = [(2654435761 * (j + 1)) % P31 for j in range(MINHASH_K)]
MINHASH_B = [(2246822519 * (j + 1)) % P31 for j in range(MINHASH_K)]

SPARK = "spark"
DUCK = "duck"


def tokens(text: str, d: str) -> str:
    """Lower-cased whitespace/comma tokenization -> array<string>, no empties."""
    if d == SPARK:
        return f"filter(split({text}, '[ ,]+'), t -> length(t) > 0)"
    return f"list_filter(string_split_regex({text}, '[ ,]+'), t -> length(t) > 0)"


def char_fold(s: str, d: str) -> str:
    """Polynomial rolling hash of a string -> bigint in [0, 2^31).

    fold(acc, c) = (acc*31 + ascii(c)) mod (2^31-1), acc0 = 7.  Identical
    int64 arithmetic in both engines.
    """
    if d == SPARK:
        return (f"aggregate(transform(split({s}, ''), c -> ascii(c)), "
                f"{FOLD_INIT}L, (acc, c) -> (acc * {FOLD_MULT} + c) % {P31})")
    return (f"list_reduce([CAST({FOLD_INIT} AS BIGINT)] || "
            f"list_transform(string_split({s}, ''), c -> ord(c)), "
            f"(acc, c) -> (acc * {FOLD_MULT} + c) % {P31})")


def token_hashes(tokens_expr: str, d: str) -> str:
    """array<string> tokens -> array<bigint> rolling hashes."""
    if d == SPARK:
        return f"transform({tokens_expr}, t -> {char_fold('t', d)})"
    return f"list_transform({tokens_expr}, t -> {char_fold('t', d)})"


def shingle_hashes(th: str, d: str, n: int = 3) -> str:
    """array<bigint> token hashes -> array<bigint> n-gram shingle hashes.

    shingle(i) = fold of n consecutive token hashes with SHINGLE_MULT mod P31.
    ``th`` must be a COLUMN NAME (referenced n+1 times).
    """
    assert n == 3, "only 3-shingles emitted for now"

    def comb(e1: str, e2: str, e3: str) -> str:
        return (f"((({e1}) * {SHINGLE_MULT} + ({e2})) % {P31} "
                f"* {SHINGLE_MULT} + ({e3})) % {P31}")

    if d == SPARK:
        body = comb(f"element_at({th}, i)", f"element_at({th}, i+1)",
                    f"element_at({th}, i+2)")
        return (f"CASE WHEN size({th}) >= {n} THEN "
                f"transform(sequence(1, size({th}) - {n - 1}), i -> {body}) "
                f"ELSE array() END")
    body = comb(f"{th}[i]", f"{th}[i+1]", f"{th}[i+2]")
    return f"list_transform(range(1, len({th}) - {n - 2}), i -> {body})"


def minhash_min(sh_col: str, j: int) -> str:
    """Aggregate MIN minhash_j over exploded shingle rows (same both dialects)."""
    return f"min(({MINHASH_A[j]} * {sh_col} + {MINHASH_B[j]}) % {P31})"


def dot_product(a: str, b: str, d: str) -> str:
    """Order-deterministic double dot product of two float arrays.

    Sequential left fold in index order -> bit-identical IEEE result in both
    engines (float->double casts are exact).
    """
    if d == SPARK:
        return (f"aggregate(zip_with({a}, {b}, "
                f"(x, y) -> cast(x AS double) * cast(y AS double)), "
                f"0D, (s, v) -> s + v)")
    return (f"list_reduce([CAST(0 AS DOUBLE)] || "
            f"list_transform(range(1, len({a}) + 1), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
            f"(s, v) -> s + v)")


def dot_literal(vec: str, plane: list[float], d: str) -> str:
    """Dot product of a float-array column with a literal double vector.

    Emitted as a FLAT left-associated sum `0 + e1 + e2 + ...` — the exact
    IEEE addition order of the sequential fold it replaces, but pure
    native arithmetic: Catalyst's higher-order `aggregate()` is
    interpreted (no whole-stage codegen, ~15us per 64-element fold),
    while this unrolled form codegens (~10x on the LSH signature step).
    """
    if d == SPARK:
        terms = " + ".join(
            f"cast(element_at({vec}, {i + 1}) AS double) * {v!r}D"
            for i, v in enumerate(plane))
        return f"(0D + {terms})"
    terms = " + ".join(
        f"CAST({vec}[{i + 1}] AS DOUBLE) * ({v!r})"
        for i, v in enumerate(plane))
    return f"(CAST(0 AS DOUBLE) + {terms})"


def dot_unrolled(a: str, b: str, d: str, dim: int) -> str:
    """`dot_product` for a KNOWN vector width, unrolled to flat native
    arithmetic (same left-to-right IEEE addition order as the fold, so
    values are bit-identical).  Used on every fixed-width (DIM=64)
    embedding hot path; the fold form remains for unknown widths."""
    if d == SPARK:
        terms = " + ".join(
            f"cast(element_at({a}, {i}) AS double) * "
            f"cast(element_at({b}, {i}) AS double)"
            for i in range(1, dim + 1))
        return f"(0D + {terms})"
    terms = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(1, dim + 1))
    return f"(CAST(0 AS DOUBLE) + {terms})"


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-0.5, 0.5)^dim.

    Same multiplicative-hash stream GeoMesa-style z-shard salting uses
    (ShardStrategy.scala:75-83 hashes ids the same way); values are exact
    doubles reproduced verbatim in both dialects via repr().
    """
    out = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = ((j * dim + i + 1) * 2654435761) % 4294967296
            row.append(h / 4294967296.0 - 0.5)
        out.append(row)
    return out
