"""Similarity search: LSH recall vs brute force; array-math sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_big_data_analytics_spark.functions.arrays import cosine_similarity
from real_time_big_data_analytics_spark.operators import similarity


def test_knn_bruteforce_shape(spark, sf_dir):
    df = similarity.knn_bruteforce(spark, sf_dir)
    rows = df.collect()
    per_query = {}
    for r in rows:
        per_query.setdefault(r.query_id, []).append(r)
    assert set(per_query) == set(range(similarity.N_QUERIES))
    for q, rs in per_query.items():
        assert len(rs) == similarity.TOP_K
        sims = [r.sim for r in sorted(rs, key=lambda r: r.rk)]
        assert sims == sorted(sims, reverse=True)
        assert all(-1.0 <= s <= 1.0 for s in sims)


def test_knn_lsh_subset_of_true_sims(spark, sf_dir):
    """LSH results must agree with brute-force similarity values
    (approximate candidate set, exact scores)."""
    brute = {
        (r.query_id, r.vec_id): r.sim
        for r in similarity.knn_bruteforce(spark, sf_dir, k=10**6).collect()
    }
    lsh = similarity.knn_lsh(spark, sf_dir).collect()
    assert lsh, "LSH should return some candidates"
    for r in lsh:
        assert abs(brute[(r.query_id, r.vec_id)] - r.sim) < 1e-9


def test_cosine_self_similarity(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sims = emb.select(
        cosine_similarity("embedding", "embedding").alias("s")
    ).collect()
    assert all(abs(r.s - 1.0) < 1e-9 for r in sims)
