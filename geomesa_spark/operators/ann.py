"""Embedding similarity operators: brute-force cosine top-k, LSH-bucketed ANN,
cosine near-duplicate pairs.

Distances are order-deterministic sequential folds (portable.dot_product) so
the DuckDB oracle reproduces every double bit-for-bit; checked outputs carry
neighbor identity + rank (ties broken by id), never raw floats.

Scale design (10^9+ vectors):
* brute-force top-k broadcasts the (small) query set and scans the corpus
  once — the correct baseline plan; per-partition partial top-k happens
  map-side via the rank window's sort spill.
* lsh_topk assigns every vector to a sign-hyperplane bucket (8 planes ->
  256 buckets) at write time; a query probes only its own bucket — the
  bucket column is the shuffle/partition key, exactly the cell-id role in
  the spatial engine (SURVEY.md §1.3).  Same-bucket join is a hash join on
  bucket id, never a cross join.
* near_dup_pairs self-joins within buckets only, then refines on exact
  cosine — the embedding analog of cell-join + exact-geometry refine
  (GeoMesaJoinRelation.scala:41-91).

For very wide vectors the expression fold can be swapped for a pandas-UDF
matmul (numpy BLAS) — provided as `cosine_topk_arrow` — at the cost of
bit-exact oracle parity (BLAS reorders sums), so the checked queries use the
fold path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geomesa_spark.functions import portable as pt

N_PLANES = 8
DIM = 64
PLANES = pt.hyperplanes(N_PLANES, DIM)


def with_bucket(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Adds the 8-bit sign-LSH `bucket` column (0..255), pure Catalyst."""
    bucket = None
    for j, plane in enumerate(PLANES):
        bit = F.when(F.expr(pt.dot_literal(vec_col, plane, pt.SPARK)) > 0,
                     F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else (bucket + bit)
    return df.withColumn("bucket", bucket.cast("int"))


def bucket_sql_expr(vec_col: str, d: str) -> str:
    """The same bucket assignment as a dialect SQL expression (oracle side)."""
    parts = [f"(CASE WHEN ({pt.dot_literal(vec_col, plane, d)}) > 0 "
             f"THEN {1 << j} ELSE 0 END)"
             for j, plane in enumerate(PLANES)]
    return "(" + " + ".join(parts) + ")"


def _sim(vec_a: str, vec_b: str):
    """Cosine similarity column (unit-safe: explicit norm division)."""
    dot = F.expr(pt.dot_product(vec_a, vec_b, pt.SPARK))
    na = F.sqrt(F.expr(pt.dot_product(vec_a, vec_a, pt.SPARK)))
    nb = F.sqrt(F.expr(pt.dot_product(vec_b, vec_b, pt.SPARK)))
    return dot / (na * nb)


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force exact cosine top-k: broadcast queries x full corpus scan."""
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    cand = corpus.select(F.col(id_col), F.col(vec_col))
    sim = _sim(vec_col, "qvec")
    win = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc(id_col))
    return (cand.crossJoin(F.broadcast(q))
            .where(F.col("qid") != F.col(id_col))
            .withColumn("sim", sim)
            .withColumn("ann_rank", F.row_number().over(win))
            .where(F.col("ann_rank") <= k)
            .select("qid", id_col, "ann_rank"))


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN top-k probing only the query's sign-LSH bucket (scale path)."""
    c = with_bucket(corpus, vec_col)
    q = (with_bucket(queries, vec_col)
         .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"),
                 "bucket"))
    sim = _sim(vec_col, "qvec")
    win = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc(id_col))
    return (c.join(F.broadcast(q), "bucket")
            .where(F.col("qid") != F.col(id_col))
            .withColumn("sim", sim)
            .withColumn("ann_rank", F.row_number().over(win))
            .where(F.col("ann_rank") <= k)
            .select("qid", id_col, "ann_rank"))


def near_dup_pairs(corpus: DataFrame, threshold: float = 0.99,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding near-duplicate pairs: bucket-join candidates + exact refine.

    Same-sign-bucket pairs (duplicates always share the bucket: scaling by a
    positive factor preserves every hyperplane sign) refined with exact
    cosine >= threshold.  Output (id_a < id_b, sim_ppm).
    """
    b = with_bucket(corpus, vec_col)
    la = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"),
                  "bucket")
    lb = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"),
                  "bucket")
    sim = _sim("vec_a", "vec_b")
    return (la.join(lb, "bucket")
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("sim", sim)
            .where(F.col("sim") >= threshold)
            .select("id_a", "id_b",
                    F.floor(F.col("sim") * 1e6).cast("long").alias("sim_ppm")))


def cosine_topk_arrow(corpus: DataFrame, queries_pd: pd.DataFrame, k: int = 5,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Vectorized (numpy/BLAS) brute-force top-k — the wide-vector fast path.

    `queries_pd` is a small pandas frame (qid, qvec list).  Each Arrow batch
    computes a full matmul; per-partition top-k keeps shuffle tiny, the final
    exact top-k is a window over ~k*partitions rows.
    """
    qids = queries_pd["qid"].to_numpy()
    qmat = np.stack(queries_pd["qvec"].to_numpy()).astype(np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)

    out_schema = f"qid long, {id_col} long, sim double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = mat @ qmat.T                      # (batch, nq)
            ids = pdf[id_col].to_numpy()
            parts = []
            for qi, qid in enumerate(qids):
                col = sims[:, qi]
                mask = ids != qid
                take = min(k, int(mask.sum()))
                if take == 0:
                    # batch contains only the query row itself
                    continue
                idx = np.argpartition(-col[mask], take - 1)[:take]
                parts.append(pd.DataFrame({
                    "qid": qid, id_col: ids[mask][idx], "sim": col[mask][idx]}))
            if parts:
                yield pd.concat(parts, ignore_index=True)

    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    win = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc(id_col))
    return (scored.withColumn("ann_rank", F.row_number().over(win))
            .where(F.col("ann_rank") <= k)
            .select("qid", id_col, "ann_rank"))
