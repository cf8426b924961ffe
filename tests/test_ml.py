"""ML parity: determinism, golden output shape, accuracy floor
(SURVEY.md §5.2 golden-parity strategy)."""

from __future__ import annotations

from real_time_big_data_analytics_spark.operators import ml


def test_train_score_deterministic(spark, sf_dir):
    a = {(r.user_id, r.prediction) for r in ml.train_score_users(spark, sf_dir).collect()}
    b = {(r.user_id, r.prediction) for r in ml.train_score_users(spark, sf_dir).collect()}
    assert a == b


def test_verdict_strings_match_reference(spark, sf_dir):
    """Verdict encoding parity with reference ConsumerESFinal.scala:82."""
    rows = ml.train_score_users(spark, sf_dir).collect()
    assert {r.bolt_user for r in rows} <= {"Bolt", "Not bolt"}
    for r in rows:
        assert r.bolt_user == ("Not bolt" if r.prediction == 0 else "Bolt")


def test_training_accuracy_floor(spark, sf_dir):
    rows = ml.train_score_users(spark, sf_dir).collect()
    acc = sum(r.label == r.prediction for r in rows) / len(rows)
    assert acc >= 0.85, f"in-sample accuracy {acc:.2f}"


def test_holdout_confusion_counts(spark, sf_dir):
    rows = ml.holdout_eval(spark, sf_dir).collect()
    total = sum(r.n for r in rows)
    correct = sum(r.n for r in rows if r.label == r.prediction)
    assert total > 0
    assert correct / total >= 0.6, f"holdout accuracy {correct / total:.2f}"
