"""Dedup family: idempotence, recall of approximate vs exact
(SURVEY.md §5.2 property checks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_big_data_analytics_spark.operators import dedup_approx, text
from tests.conftest import SF_CORRECT


def test_exact_dedup_idempotent(spark, sf_dir):
    once = text.exact_dedup(spark, sf_dir)
    assert once.count() == once.dropDuplicates(["doc_id"]).count()
    # dedup of already-deduped ids is a fixpoint
    ids = {r.doc_id for r in once.select("doc_id").collect()}
    again = {r.doc_id for r in text.exact_dedup(spark, sf_dir).collect()}
    assert ids == again


def test_dup_groups_cover_all_docs(spark, sf_dir):
    stats = text.dup_group_stats(spark, sf_dir)
    total = stats.agg(F.sum("n_copies")).collect()[0][0]
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert total == n_docs


def test_minhash_recall_vs_exact_jaccard(spark):
    """MinHash LSH must recover most exact-Jaccard≥0.8 pairs."""
    exact = {
        (r.a_id, r.b_id)
        for r in text.ngram_jaccard_pairs(spark, SF_CORRECT, threshold=0.8).collect()
    }
    assert exact, "fixture should contain near-dup pairs at sf0.01"
    approx = {
        (r.a_id, r.b_id)
        for r in dedup_approx.minhash_lsh_pairs(
            spark, SF_CORRECT, jaccard_distance_threshold=0.25
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall:.2f} < 0.9"


def test_simhash_similar_docs_have_close_signatures(spark):
    """Near-dup pairs (exact jaccard) should sit within small Hamming
    distance of each other's simhash."""
    pairs = text.ngram_jaccard_pairs(spark, SF_CORRECT, threshold=0.8).collect()
    sigs = {
        r.doc_id: r.sig
        for r in dedup_approx.simhash_signatures(spark, SF_CORRECT).collect()
    }
    assert pairs
    for p in pairs:
        ham = sum(a != b for a, b in zip(sigs[p.a_id], sigs[p.b_id]))
        assert ham <= 16, f"near-dup pair {(p.a_id, p.b_id)} hamming {ham}"


def test_near_dup_clusters_are_consistent(spark):
    """Cluster reps must be component minima: every doc's rep is ≤ its
    id, reps are their own reps, and both ends of every pair land in
    the same cluster."""
    from real_time_big_data_analytics_spark.operators.clustering import near_dup_clusters

    labels = {r.doc_id: r.cluster_rep for r in near_dup_clusters(spark, SF_CORRECT).collect()}
    assert labels
    for doc, rep in labels.items():
        assert rep <= doc
        assert labels[rep] == rep  # representative is canonical
    pairs = text.ngram_jaccard_pairs(spark, SF_CORRECT, threshold=0.8).collect()
    for p in pairs:
        assert labels[p.a_id] == labels[p.b_id]
