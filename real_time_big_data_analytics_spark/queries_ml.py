"""Registrations: ML train/score parity ops (SURVEY.md §2.10)."""

from __future__ import annotations

from .operators import ml
from .registry import register

# Fixture derivation is fully SQL-expressible — hash-checked.
register(
    "m0_label_distribution",
    ml.label_distribution,
    sql="""
    WITH per_user AS (
      SELECT user_id,
             CAST(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
                  / count(*) > 0.25 AS INT) AS label
      FROM events GROUP BY user_id
    )
    SELECT label, count(*) AS n_users FROM per_user GROUP BY label
    """,
    tags=("ml", "fixture"),
)

# Tree predictions aren't SQL-expressible — rows-only + pytest
# (determinism, golden shape, accuracy floor).
register("m1_train_score_users", ml.train_score_users, tags=("ml", "train", "score"))
register("m3_holdout_eval", ml.holdout_eval, tags=("ml", "eval"))
