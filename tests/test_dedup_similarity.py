"""Dedup + similarity operators: planted-duplicate truth tests on the
driver documents/embeddings tables."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mq_to_db_spark.operators.dedup import (
    dedup_exact,
    dedup_minhash,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from mq_to_db_spark.operators.similarity import ann_lsh_topk, cosine_topk, knn_join_brute

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_with_dupes(spark, docs):
    """Plant exact + near duplicates with known ids ≥ 100000."""
    base = docs.limit(20).collect()
    extra = []
    for i, r in enumerate(base[:5]):
        extra.append((100000 + i, r.text, r.lang, r.source, r.n_chars))  # exact dup
    for i, r in enumerate(base[5:10]):
        extra.append((100100 + i, r.text + " extra tail words here", r.lang, r.source, r.n_chars))
    extra_df = spark.createDataFrame(extra, schema=docs.schema)
    return docs.unionByName(extra_df).cache()


def test_dedup_exact(spark, docs_with_dupes, docs):
    kept = dedup_exact(docs_with_dupes, "doc_id", "text")
    # 5 exact dupes collapse; the 5 near-dup rows legitimately survive
    assert kept.count() == docs.count() + 5
    # representatives are the lowest ids → survivors ≥100000 are exactly
    # the near-dup plants
    assert kept.filter(F.col("doc_id") >= 100000).count() == 5
    dup_classes = kept.filter(F.col("dup_count") > 1)
    assert dup_classes.count() == 5
    assert dup_classes.filter(F.col("doc_id") < 100000).count() == 5


def test_minhash_finds_planted_pairs(spark, docs_with_dupes):
    pairs = minhash_lsh_pairs(
        docs_with_dupes, "doc_id", "text", verify_threshold=0.5
    ).toPandas()
    found = set(zip(pairs.id_a, pairs.id_b))
    # every exact dup pair (jaccard 1.0) must be found
    for i in range(5):
        orig = docs_with_dupes.filter(F.col("doc_id") == 100000 + i).collect()[0]
    exact_pairs = {(p.id_a, p.id_b) for p in pairs.itertuples() if p.jaccard >= 0.999}
    assert len(exact_pairs) >= 5
    # near-dup (appended tail) pairs found with jaccard in (0.5, 1)
    near = pairs[(pairs.id_b >= 100100) & (pairs.jaccard < 0.999)]
    assert len(near) >= 4  # high-probability LSH recall on 8 bands


def test_dedup_minhash_removes_near_dupes(spark, docs_with_dupes, docs):
    kept = dedup_minhash(docs_with_dupes, "doc_id", "text", threshold=0.5)
    # all 10 planted rows have a lower-id twin with jaccard > 0.5
    assert kept.count() <= docs.count() + 1  # allow 1 LSH miss
    assert kept.filter((F.col("doc_id") >= 100000) & (F.col("doc_id") < 100100)).count() == 0


def test_ngram_jaccard_exact_values(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "a b c x y"), (4, "q r s t u")],
        "id long, text string",
    )
    pairs = ngram_jaccard_pairs(df, "id", "text", shingle_n=3, threshold=0.1).toPandas()
    got = {(r.id_a, r.id_b): round(r.jaccard, 6) for r in pairs.itertuples()}
    # doc1/doc2 identical: 3 shingles shared of 3 → 1.0
    assert got[(1, 2)] == 1.0
    # doc1/doc3 share "a b c" only: 1 of 5 → 0.2
    assert got[(1, 3)] == pytest.approx(0.2)
    assert (1, 4) not in got


def test_simhash_pairs(spark, docs_with_dupes):
    pairs = simhash_pairs(docs_with_dupes, "doc_id", "text", max_hamming=3).toPandas()
    exact = pairs[pairs.hamming == 0]
    assert len(exact) >= 5  # planted exact dupes collide at distance 0


def test_cosine_topk_self_hit(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter("vec_id = 0").collect()[0].embedding
    top = cosine_topk(emb, list(q), k=5).toPandas()
    assert top.iloc[0].vec_id == 0
    assert top.iloc[0].cosine == pytest.approx(1.0, abs=1e-6)
    assert (top.cosine.values[:-1] >= top.cosine.values[1:]).all()  # sorted


def test_ann_lsh_recall(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    q = emb.filter("vec_id = 0").collect()[0].embedding
    exact = set(cosine_topk(emb, list(q), k=10).toPandas().vec_id)
    approx = set(
        ann_lsh_topk(emb, list(q), k=10, n_planes=6, multiprobe=2).toPandas().vec_id
    )
    # multiprobe LSH recall@10 ≥ 0.5 on 500 vectors (probabilistic but
    # deterministic given fixed seed planes)
    assert len(exact & approx) >= 5
    assert 0 in approx


def test_knn_join(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    left = emb.limit(10).select(F.col("vec_id").alias("id_l"), "embedding")
    right = emb.select(F.col("vec_id").alias("id_r"), "embedding")
    knn = knn_join_brute(left, right, k=3).toPandas()
    assert len(knn) == 30
    # self is always the nearest neighbor
    top1 = knn[knn["rank"] == 1]
    assert (top1.lid == top1.rid).all()


def test_ivf_topk_recall_and_determinism(spark):
    from mq_to_db_spark.operators.similarity import (
        cosine_topk,
        ivf_centroids,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qv = list(emb.filter("vec_id = 3").collect()[0].embedding)

    exact = [r.vec_id for r in cosine_topk(emb, qv, k=10).collect()]
    # centroids are hash-deterministic: same list twice
    c1 = ivf_centroids(emb, 8)
    c2 = ivf_centroids(emb, 8)
    assert c1 == c2

    approx = [r.vec_id for r in ivf_topk(emb, qv, k=10, n_centroids=8, nprobe=3).collect()]
    recall3 = len(set(exact) & set(approx)) / 10
    # synthetic embeddings are ~isotropic random vectors, the worst case
    # for coarse quantization — assert usefulness + monotonicity, not
    # clustered-data recall
    assert recall3 >= 0.3, recall3
    approx6 = [r.vec_id for r in ivf_topk(emb, qv, k=10, n_centroids=8, nprobe=6).collect()]
    recall6 = len(set(exact) & set(approx6)) / 10
    assert recall6 >= recall3
    # nprobe = n_centroids degenerates to exact brute force
    full = [r.vec_id for r in ivf_topk(emb, qv, k=10, n_centroids=8, nprobe=8).collect()]
    assert full == exact
