"""Document/embedding corpus loaders with deterministic planted duplicates.

The driver's `documents` table has no duplicate rows and `embeddings` holds
i.i.d. unit vectors, so to exercise the dedup / near-dup operators we augment
both tables IN-QUERY with deterministically derived rows:

* exact duplicates:  every 13th doc re-emitted verbatim at doc_id + 20M,
* near duplicates:   every 10th doc re-emitted as its 80%-token prefix at
  doc_id + 10M (high n-gram Jaccard with the original),
* embedding near-dups: every 5th vector re-emitted scaled by 0.5 (an exact
  binary op -> cosine exactly 1.0) at vec_id + 100k.

Both the Spark DataFrame and the DuckDB oracle CTE are generated from the
same constants, so derived rows are bit-identical across engines (the same
trick sources/testdata.py uses for the synthetic geo columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from geomesa_spark.functions import portable as pt

EXACT_OFF = 20_000_000
NEAR_OFF = 10_000_000
EXACT_MOD = 13   # doc_id % 13 == 1  -> exact duplicate planted
NEAR_MOD = 10    # doc_id % 10 == 3  -> 80%-prefix near-duplicate planted
VEC_OFF = 100_000
VEC_MOD = 5      # vec_id % 5 == 0   -> scaled (x0.5) near-dup vector planted


def _prefix_text(d: str) -> str:
    """Text rebuilt from the first 80% of tokens (>=1)."""
    toks = pt.tokens("text", d)
    if d == pt.SPARK:
        return (f"array_join(slice({toks}, 1, "
                f"greatest(cast(floor(size({toks}) * 0.8e0) AS int), 1)), ' ')")
    return (f"array_to_string(({toks})[1:"
            f"greatest(cast(floor(len({toks}) * 0.8e0) AS int), 1)], ' ')")


def corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + planted exact/near duplicates (Spark side)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("_gm_documents")
    return spark.sql(corpus_sql(pt.SPARK, table="_gm_documents"))


def corpus_sql(d: str = pt.DUCK, table: str = "documents") -> str:
    """Dialect SQL producing the augmented corpus (doc_id, text, lang, source)."""
    prefix = _prefix_text(d)
    return f"""
        SELECT doc_id, text, lang, source FROM {table}
        UNION ALL
        SELECT doc_id + {EXACT_OFF} AS doc_id, text, lang, source
        FROM {table} WHERE doc_id % {EXACT_MOD} = 1
        UNION ALL
        SELECT doc_id + {NEAR_OFF} AS doc_id, {prefix} AS text, lang, source
        FROM {table} WHERE doc_id % {NEAR_MOD} = 3
    """


def vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings + planted scaled near-dup vectors (Spark side)."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    embs.createOrReplaceTempView("_gm_embeddings")
    return spark.sql(vectors_sql(pt.SPARK, table="_gm_embeddings"))


def vectors_sql(d: str = pt.DUCK, table: str = "embeddings") -> str:
    """Dialect SQL producing the augmented vector table (vec_id, embedding, label)."""
    if d == pt.SPARK:
        scaled = "transform(embedding, x -> cast(cast(x AS double) * 0.5e0 AS float))"
    else:
        scaled = "list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 0.5e0 AS FLOAT))"
    return f"""
        SELECT vec_id, embedding, label FROM {table}
        UNION ALL
        SELECT vec_id + {VEC_OFF} AS vec_id, {scaled} AS embedding, label
        FROM {table} WHERE vec_id % {VEC_MOD} = 0
    """
