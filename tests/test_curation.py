"""End-to-end curation pipeline: planted duplicates removed, quality filter
applied, lineage-based resume skips completed stage partitions."""

import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.curation import curate
from geomesa_spark.sources import documents as docsrc


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return docsrc.corpus(spark, sf_dir).cache()


def test_curate_drops_planted_dups_and_resumes(spark, sf_dir, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("curation"))
    kept = curate(spark, corpus, root, jaccard_threshold=0.6)

    # all planted exact copies (doc_id >= EXACT_OFF) removed, originals kept
    assert kept.where(f"doc_id >= {docsrc.EXACT_OFF}").count() == 0
    originals = corpus.where(
        f"doc_id % {docsrc.EXACT_MOD} = 1 AND doc_id < {docsrc.NEAR_OFF}")
    kept_orig = kept.join(originals.select("doc_id"), "doc_id").count()
    assert kept_orig > 0

    # near-duplicate prefix copies with high jaccard removed
    n_near_kept = kept.where(
        f"doc_id >= {docsrc.NEAR_OFF} AND doc_id < {docsrc.EXACT_OFF}").count()
    n_near_planted = corpus.where(
        f"doc_id >= {docsrc.NEAR_OFF} AND doc_id < {docsrc.EXACT_OFF}").count()
    assert n_near_kept < n_near_planted * 0.5

    # annotations present
    assert {"n_tok", "stop_ppm", "fp", "pred_lang"} <= set(kept.columns)

    # resume: second run appends NO new lineage rows (all partitions skipped)
    lineage_before = spark.read.parquet(f"{root}/_lineage").count()
    curate(spark, corpus, root, jaccard_threshold=0.6)
    lineage_after = spark.read.parquet(f"{root}/_lineage").count()
    assert lineage_after == lineage_before

    # metrics recorded per stage
    metrics = spark.read.parquet(f"{root}/_metrics")
    stages = {r.stage for r in metrics.select("stage").distinct().collect()}
    assert {"annotate", "exact_drop", "near_drop", "kept"} <= stages


def test_curate_partial_resume(spark, corpus, tmp_path_factory):
    """Deleting one stage's lineage rows re-runs ONLY that stage."""
    root = str(tmp_path_factory.mktemp("curation2"))
    curate(spark, corpus, root)
    lin = spark.read.parquet(f"{root}/_lineage")
    keep_rows = lin.where("stage != 'kept'")
    # rewrite lineage without the last stage (simulates a crash before it)
    keep_pd = keep_rows.toPandas()
    import shutil
    shutil.rmtree(f"{root}/_lineage")
    spark.createDataFrame(keep_pd).write.parquet(f"{root}/_lineage")

    before = spark.read.parquet(f"{root}/_lineage").count()
    curate(spark, corpus, root)
    lin2 = spark.read.parquet(f"{root}/_lineage")
    # only 'kept' partitions were re-executed
    assert lin2.where("stage = 'kept'").count() == 4
    assert lin2.count() == before + 4
