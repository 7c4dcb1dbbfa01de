"""End-to-end training-data curation pipeline with checkpointed lineage.

Composes the pipeline operators into the shape a 100 TB pretraining-data
job takes — each stage a resumable CheckpointedPipeline stage partitioned
by a stable key, so a killed job skips completed partitions on re-run
(the reference analog: MapReduce restart + PartitionOutputFormat,
fs-storage-common jobs/PartitionOutputFormat.scala):

1. ``annotate``   — quality metrics + fingerprint + predicted language per doc
2. ``exact_dedup`` — drop exact duplicates (content hash, keep min id)
3. ``near_dedup`` — MinHash-LSH candidates + exact-Jaccard verify, greedy
   keep-lowest-id sweep
4. ``filter``     — quality thresholds (token count, stopword density)

Stage partitioning uses ``doc_id % n_parts`` (uniform, stable across runs);
pair-generating stages run global (near-dup pairs cross partitions) but
their DROP LIST is partitioned for the resumable write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geomesa_spark.operators import dedup, text
from geomesa_spark.sources.layout import CheckpointedPipeline


def curate(spark: SparkSession, docs: DataFrame, root: str,
           n_parts: int = 4, jaccard_threshold: float = 0.6,
           min_tokens: int = 8, min_stop_ppm: int = 0) -> DataFrame:
    """Run the full curation pipeline under ``root``; returns the kept docs.

    Idempotent: re-running with the same inputs skips completed stage
    partitions via the lineage table.
    """
    pipe = CheckpointedPipeline(spark, root)

    part_pred = "doc_id % {n} = {k}"

    # stage 1: per-doc annotations (quality, fingerprint, langid)
    quality = text.text_quality(docs)
    fps = text.fingerprint(docs)
    lang = text.langid(docs)
    annotated = (docs.join(quality, "doc_id").join(fps, "doc_id")
                 .join(lang.select("doc_id", "pred_lang"), "doc_id"))

    def build_annotate(key: str) -> DataFrame:
        return annotated.where(part_pred.format(n=n_parts, k=key))

    pipe.run_stage("annotate", [str(i) for i in range(n_parts)], build_annotate)
    ann = pipe.read_stage("annotate")

    # stage 2: exact-duplicate drop list (non-canonical copies)
    groups = dedup.exact_dedup(docs)
    dup_keys = (docs.withColumn("dup_key", F.md5("text"))
                .join(groups, "dup_key")
                .where(F.col("doc_id") != F.col("canonical_id"))
                .select("doc_id"))

    def build_exact(key: str) -> DataFrame:
        return dup_keys.where(part_pred.format(n=n_parts, k=key))

    pipe.run_stage("exact_drop", [str(i) for i in range(n_parts)], build_exact)
    exact_drop = pipe.read_stage("exact_drop").select("doc_id")

    # stage 3: near-duplicate drop list (MinHash-LSH + verify, keep lowest id)
    pairs = dedup.minhash_lsh_pairs(docs, threshold=jaccard_threshold)
    near_drop_all = pairs.select(F.col("id_b").alias("doc_id")).distinct()

    def build_near(key: str) -> DataFrame:
        return near_drop_all.where(part_pred.format(n=n_parts, k=key))

    pipe.run_stage("near_drop", [str(i) for i in range(n_parts)], build_near)
    near_drop = pipe.read_stage("near_drop").select("doc_id")

    # stage 4: quality filter + drops applied
    kept = (ann
            .join(exact_drop, "doc_id", "left_anti")
            .join(near_drop, "doc_id", "left_anti")
            .where((F.col("n_tok") >= min_tokens)
                   & (F.col("stop_ppm") >= min_stop_ppm)))

    def build_kept(key: str) -> DataFrame:
        return kept.where(part_pred.format(n=n_parts, k=key))

    pipe.run_stage("kept", [str(i) for i in range(n_parts)], build_kept)
    out = pipe.read_stage("kept")
    # metric from the materialized stage, not this run's written rows — on a
    # resumed run with all partitions skipped the written count would be 0
    pipe.record_metric("kept", "docs_kept", out.count())
    return out
