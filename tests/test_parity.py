"""P-series reference parity: codec guards + the golden 9-column shape."""

from __future__ import annotations

from real_time_big_data_analytics_spark.operators import parity

REFERENCE_9COL = [
    "statuses_count",
    "followers_count",
    "friends_count",
    "favourites_count",
    "protected",
    "verified",
    "lang",
    "location",
    "bolt_user",
]


def test_csv_pipeline_filters_noise(spark, sf_dir):
    """Header + malformed rows must not survive the P2/P7 guards."""
    df = parity.csv_parse_pipeline(spark, sf_dir)
    rows = df.collect()
    types = {r.event_type for r in rows}
    assert "event_type" not in types  # header leaked through P2
    assert "malformed" not in types  # arity guard P7 failed
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r.n for r in rows) == n_events


def test_json_roundtrip_preserves_commas(spark, sf_dir):
    """The comma-bearing field survives the JSON codec intact —
    the documented fix for SURVEY.md §1.4.1."""
    rows = parity.json_roundtrip_analytics(spark, sf_dir).collect()
    assert rows
    assert all(r.location.endswith(", local") for r in rows)


def test_scored_parity_shape(spark, sf_dir):
    """Exactly the reference's 9 columns in order, verdicts in the
    reference's domain (ConsumerESFinal.scala:82,90)."""
    df = parity.scored_parity_9col(spark, sf_dir)
    assert df.columns == REFERENCE_9COL
    rows = df.collect()
    assert rows
    assert {r.bolt_user for r in rows} <= {"Bolt", "Not bolt"}
    assert all(r.protected in (0, 1) and r.verified in (0, 1) for r in rows)


def test_p6_pinned_tree_matches_live_fit(spark):
    """The P6 oracle replays MLlib scoring through the PINNED compiled
    tree (ml.P6_TREE_PREDICT_SQL); this refit-assert is the drift
    alarm — and the partitioning sweep is the argument for why pinning
    is sound: below MLlib's 10k-row split-sampling threshold the fit is
    a pure function of the row SET."""
    from real_time_big_data_analytics_spark.operators import ml

    for nparts in (1, 5):
        fx = ml.p6_training_fixture(spark).repartition(nparts)
        model = ml.train_decision_tree(fx)
        compiled = ml.tree_to_case_sql(model.stages[1], ml.FEATURES)
        assert compiled == ml.P6_TREE_PREDICT_SQL


def test_tree_to_case_sql_walks_debug_string():
    """The toDebugString parser pinned on a hand-built tree shape."""
    from real_time_big_data_analytics_spark.operators import ml

    class Fake:
        toDebugString = (
            "DecisionTreeClassificationModel: depth=2, numNodes=5\n"
            "  If (feature 0 <= 1.5)\n"
            "   Predict: 0.0\n"
            "  Else (feature 0 > 1.5)\n"
            "   If (feature 4 <= 0.25)\n"
            "    Predict: 1.0\n"
            "   Else (feature 4 > 0.25)\n"
            "    Predict: 0.0\n"
        )

    sql = ml.tree_to_case_sql(Fake(), ml.FEATURES)
    assert sql == (
        "CASE WHEN n_events <= 1.5 THEN 0 ELSE "
        "CASE WHEN avg_value <= 0.25 THEN 1 ELSE 0 END END"
    )

    class Categorical:
        toDebugString = (
            "DecisionTreeClassificationModel: depth=1\n"
            "  If (feature 2 in {0.0,1.0})\n"
            "   Predict: 0.0\n"
            "  Else (feature 2 not in {0.0,1.0})\n"
            "   Predict: 1.0\n"
        )

    import pytest

    with pytest.raises(ValueError, match="unsupported tree node"):
        ml.tree_to_case_sql(Categorical(), ml.FEATURES)
