"""Unit tests for the training-data pipeline operators (dedup / text / ANN).

Oracle parity is covered by test_oracle_parity.py; these assert the operator
semantics directly: planted duplicates are recovered exactly, LSH candidates
verify against exact Jaccard, and the Arrow fast path agrees with the
expression fold path.
"""

import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators import ann, dedup, text
from geomesa_spark.sources import documents as docsrc


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return docsrc.corpus(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    return docsrc.vectors(spark, sf_dir).cache()


def test_exact_dedup_finds_planted(spark, sf_dir, corpus):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = docs.where(f"doc_id % {docsrc.EXACT_MOD} = 1").count()
    out = dedup.exact_dedup(corpus).collect()
    assert len(out) == planted
    for r in out:
        assert r.n_copies == 2
        # canonical is the original (lower id), not the planted copy
        assert r.canonical_id < docsrc.EXACT_OFF


def test_jaccard_pairs_recover_near_dups(spark, sf_dir, corpus):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    near_ids = {r.doc_id for r in
                docs.where(f"doc_id % {docsrc.NEAR_MOD} = 3").select("doc_id").collect()}
    pairs = dedup.jaccard_pairs(corpus, threshold=0.5).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    for i in near_ids:
        assert (i, i + docsrc.NEAR_OFF) in got, f"missing near-dup pair for {i}"
    # 80%-prefix implies Jaccard >= ~0.75 for uniform shingles
    planted = [r for r in pairs if r.id_b - r.id_a == docsrc.NEAR_OFF]
    assert min(p.jac_ppm for p in planted) > 500_000


def test_minhash_pairs_subset_of_exact(corpus):
    lsh = {(r.id_a, r.id_b) for r in
           dedup.minhash_lsh_pairs(corpus, threshold=0.4).collect()}
    exact = {(r.id_a, r.id_b) for r in
             dedup.jaccard_pairs(corpus, threshold=0.4).collect()}
    assert lsh <= exact
    # exact duplicates always collide in every band -> always recovered
    exact_dup_pairs = {(a, b) for a, b in exact if b - a == docsrc.EXACT_OFF}
    assert exact_dup_pairs <= lsh


def test_simhash_identical_for_exact_dups(corpus):
    sh = dedup.simhash(corpus)
    orig = sh.where(f"doc_id % {docsrc.EXACT_MOD} = 1 AND doc_id < {docsrc.NEAR_OFF}")
    copy = sh.where(f"doc_id >= {docsrc.EXACT_OFF}") \
             .withColumn("doc_id", F.col("doc_id") - docsrc.EXACT_OFF)
    joined = (orig.alias("a").join(copy.alias("b"), "doc_id")
              .where("a.simhash != b.simhash"))
    assert joined.count() == 0


def test_dedup_keep_canonical(corpus):
    pairs = dedup.jaccard_pairs(corpus, threshold=0.9)
    kept = dedup.dedup_keep_canonical(corpus, pairs)
    n_dropped = corpus.count() - kept.count()
    assert n_dropped > 0
    # every exact duplicate (jac == 1.0) is dropped
    assert kept.where(f"doc_id >= {docsrc.EXACT_OFF}").count() == 0


def test_embed_near_dup_exactly_planted(spark, sf_dir, vecs):
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planted = embs.where(f"vec_id % {docsrc.VEC_MOD} = 0").count()
    out = ann.near_dup_pairs(vecs, threshold=0.99).collect()
    assert len(out) == planted
    for r in out:
        assert r.id_b == r.id_a + docsrc.VEC_OFF
        assert r.sim_ppm >= 999_998  # cosine == 1 up to last-ulp fold noise


def test_ann_arrow_matches_fold(spark, sf_dir):
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = embs.where("vec_id < 5")
    want = {(r.qid, r.vec_id, r.ann_rank)
            for r in ann.cosine_topk(embs, queries, k=5).collect()}
    qpd = queries.selectExpr("vec_id AS qid", "embedding AS qvec").toPandas()
    got = {(r.qid, r.vec_id, r.ann_rank)
           for r in ann.cosine_topk_arrow(embs, qpd, k=5).collect()}
    assert got == want


def test_lsh_topk_subset_of_bucket(spark, sf_dir):
    """Every LSH neighbor must share at least one band key with its query."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = ann.lsh_topk(embs, embs.where("vec_id < 5"), k=5)
    rows = out.collect()
    assert len(rows) > 0
    keys: dict[int, set] = {}
    for r in ann.with_band_keys(embs).select("vec_id", "band", "key").collect():
        keys.setdefault(r.vec_id, set()).add((r.band, r.key))
    for r in rows:
        assert keys[r.vec_id] & keys[r.qid]


def test_band_bits_bounds_bucket_occupancy(spark):
    """Auto-scaled bits keep random band-bucket occupancy bounded, and
    planted scaled duplicates are always candidates (share every band)."""
    import numpy as np
    import pandas as pd
    rng = np.random.RandomState(7)
    n = 2000
    vecs = rng.normal(size=(n, ann.DIM))
    # skew: half the corpus leans toward one direction (hot region)
    vecs[: n // 2] += 2.0 * np.ones(ann.DIM)
    pdf = pd.DataFrame({"vec_id": np.arange(n),
                        "embedding": [v.tolist() for v in vecs]})
    df = spark.createDataFrame(pdf)
    bits = ann.band_bits(n, target_bucket=64)
    assert bits >= 5  # 2^5 = 32 >= n/64
    bk = ann.with_band_keys(df, bands=4, bits=bits)
    occ = bk.groupBy("band", "key").count().agg(F.max("count")).collect()[0][0]
    # even with the skewed half, no band bucket holds the whole corpus
    assert occ < n * 3 // 4
    # scaled duplicate of vec 0 shares every band key with vec 0
    dup = spark.createDataFrame(pd.DataFrame({
        "vec_id": [99999], "embedding": [(vecs[0] * 2.5).tolist()]}))
    dkeys = {(r.band, r.key) for r in
             ann.with_band_keys(dup, bands=4, bits=bits).collect()}
    okeys = {(r.band, r.key) for r in bk.where("vec_id = 0")
             .select("band", "key").collect()}
    assert dkeys == okeys


def test_langid_scores_all_docs(corpus):
    out = text.langid(corpus)
    assert out.count() == corpus.count()
    assert out.where("pred_lang IS NULL").count() == 0


def test_fingerprint_stable_for_dups(corpus):
    fp = text.fingerprint(corpus)
    a = fp.where(f"doc_id % {docsrc.EXACT_MOD} = 1 AND doc_id < {docsrc.NEAR_OFF}")
    b = fp.where(f"doc_id >= {docsrc.EXACT_OFF}") \
          .withColumn("doc_id", F.col("doc_id") - docsrc.EXACT_OFF)
    assert a.alias("a").join(b.alias("b"), "doc_id") \
            .where("a.fp != b.fp").count() == 0


def test_ivf_topk_recall_and_exact_degenerate(spark):
    """IVF ANN: on clustered data, probing a few lists recovers most true
    neighbors; probing ALL lists is exactly the brute-force result."""
    import numpy as np
    import pandas as pd
    rng = np.random.RandomState(13)
    # 8 well-separated gaussian clusters in 64-d
    centers = rng.normal(scale=10.0, size=(8, ann.DIM))
    vecs = np.concatenate([c + rng.normal(scale=0.5, size=(150, ann.DIM))
                           for c in centers])
    n = len(vecs)
    corpus = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(n), "embedding": [v.tolist() for v in vecs]}))
    # qids ARE the corpus ids so self-exclusion works in every path
    queries_pd = pd.DataFrame({
        "qid": [i * 150 for i in range(5)],
        "qvec": [vecs[i * 150].tolist() for i in range(5)]})

    truth = {(r.qid, r.vec_id) for r in ann.cosine_topk(
        corpus, spark.createDataFrame(pd.DataFrame({
            "vec_id": queries_pd.qid,
            "embedding": queries_pd.qvec})).withColumn(
                "vec_id", F.col("vec_id").cast("long")), k=5).collect()}

    assigned, centroids = ann.ivf_index(corpus, nlist=8)
    got = {(r.qid, r.vec_id) for r in ann.ivf_topk(
        corpus, queries_pd, k=5, nlist=8, nprobe=3,
        assigned=assigned, centroids=centroids).collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.95  # clusters are well separated

    # nprobe = nlist degenerates to exact brute force
    got_all = {(r.qid, r.vec_id) for r in ann.ivf_topk(
        corpus, queries_pd, k=5, nlist=8, nprobe=8,
        assigned=assigned, centroids=centroids).collect()}
    assert got_all == truth


def test_multiprobe_improves_recall(spark, sf_dir):
    """Multiprobe candidates are a superset of the plain LSH candidates,
    and recall against brute force does not decrease (usually improves)."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = embs.where("vec_id < 10")
    truth = {(r.qid, r.vec_id) for r in
             ann.cosine_topk(embs, queries, k=5).collect()}
    plain = {(r.qid, r.vec_id) for r in
             ann.lsh_topk(embs, queries, k=5).collect()}
    multi = {(r.qid, r.vec_id) for r in
             ann.lsh_topk_multiprobe(embs, queries, k=5).collect()}
    r_plain = len(plain & truth) / len(truth)
    r_multi = len(multi & truth) / len(truth)
    assert r_multi >= r_plain
    assert r_multi > 0


def test_simhash_pairs_recover_exact_dups(corpus):
    """Planted exact duplicates have identical signatures (hamming 0) and
    band-join recall is guaranteed for hamming <= bands-1."""
    pairs = dedup.simhash_pairs(corpus, max_hamming=3)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    planted = [(a, b) for (a, b) in got if b - a == docsrc.EXACT_OFF]
    assert planted and all(got[p] == 0 for p in planted)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        dedup.simhash_pairs(corpus, max_hamming=5, bands=4)


def test_lsh_scoring_stage_has_no_interpreted_folds(spark, sf_dir):
    """The ANN scoring/key plans must contain NO Catalyst higher-order
    lambdas (aggregate/transform/zip_with are interpreted, not codegen):
    signatures come from the Arrow kernel, scoring from the single
    unrolled native dot product."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = ann.lsh_topk(embs, embs.where("vec_id < 5"), k=5)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "lambdafunction" not in plan.lower()
    out2 = ann.cosine_topk(embs, embs.where("vec_id < 5"), k=5)
    plan2 = out2._jdf.queryExecution().optimizedPlan().toString()
    assert "lambdafunction" not in plan2.lower()


def test_band_index_roundtrip_and_two_sided_bits(spark, sf_dir, tmp_path):
    """write_band_index materializes (id, vec, norm, band, key) with a
    manifest; lsh_topk over the index returns the same rows as the inline
    path, and auto-scaled bits resolve ONCE for both join sides."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "bandix")
    idx = ann.write_band_index(embs, path, bits=8)
    assert set(["vec_id", "embedding", "__norm", "band", "key"]) \
        <= set(idx.columns)
    _, manifest = ann.read_band_index(spark, path)
    assert manifest["bands"] == ann.DEFAULT_BANDS and manifest["bits"] == 8

    inline = {tuple(r) for r in
              ann.lsh_topk(embs, embs.where("vec_id < 5"), k=5).collect()}
    stored = {tuple(r) for r in
              ann.lsh_topk(embs, embs.where("vec_id < 5"), k=5,
                           sig_path=str(tmp_path / "bandix2")).collect()}
    assert inline == stored

    # bits=None auto-scaling must produce IDENTICAL keys on both sides:
    # recall of exact duplicates is 1 at any bits, so the planted
    # duplicate pairs must appear even when bits is auto-resolved
    auto = ann.lsh_topk(embs, embs.where("vec_id < 5"), k=5, bits=None)
    assert auto.count() > 0


def _uf_components(edges):
    """Reference union-find closure for connected_components tests."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _cc_spark(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = dedup.connected_components(df).collect()
    labels = {r["node_id"]: r["cluster_id"] for r in got}
    assert len(labels) == len(got), "duplicate node labels"
    return labels


def test_connected_components_chain(spark):
    # a 64-node chain: the adversarial case for plain min-label
    # propagation (O(diameter) rounds); large-star/small-star must
    # converge within the iteration guard and label everything 0
    edges = [(i, i + 1) for i in range(63)]
    labels = _cc_spark(spark, edges)
    assert labels == {i: 0 for i in range(64)}


def test_connected_components_multiple_and_orientation(spark):
    # mixed edge orientation + self-loop noise + two components
    edges = [(5, 3), (3, 9), (20, 21), (21, 20), (7, 7)]
    labels = _cc_spark(spark, edges)
    assert labels == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_connected_components_random_matches_union_find(spark):
    import random
    rng = random.Random(42)
    nodes = list(range(200))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _uf_components(edges)
    got = _cc_spark(spark, edges)
    assert got == want


def _cluster_labels(spark, corpus_ids, edges):
    corpus = spark.createDataFrame([(i,) for i in corpus_ids], "doc_id long")
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = dedup.cluster_labels(corpus, pairs).collect()
    labels = {r["node_id"]: r["cluster_id"] for r in got}
    assert len(labels) == len(got), "duplicate node labels"
    return labels


def test_cluster_labels_singletons_chain_hub(spark):
    """Total labeling: every corpus doc gets exactly one row — paired docs
    take the component min, unpaired docs label themselves. Shapes: a
    chain (diameter stress), a hub (degree stress), and pure singletons."""
    chain = [(i, i + 1) for i in range(10, 18)]          # docs 10..18
    hub = [(50, x) for x in range(51, 60)]               # star on 50..59
    corpus_ids = list(range(0, 5)) + list(range(10, 19)) + list(range(50, 60))
    labels = _cluster_labels(spark, corpus_ids, chain + hub)
    want = {i: i for i in range(0, 5)}                   # singletons
    want |= {i: 10 for i in range(10, 19)}               # chain -> min 10
    want |= {i: 50 for i in range(50, 60)}               # hub -> min 50
    assert labels == want
    # keep-policy shape: one canonical doc per cluster
    keep = {n for n, c in labels.items() if n == c}
    assert keep == {0, 1, 2, 3, 4, 10, 50}


def test_cluster_labels_no_pairs(spark):
    """Empty pair set: every doc is its own cluster (the CC loop's zero-edge
    early exit must not drop the singleton append)."""
    labels = _cluster_labels(spark, [7, 8, 9], [])
    assert labels == {7: 7, 8: 8, 9: 9}
