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

# Tree predictions aren't SQL-expressible, but the bound-assertion
# twin pattern (operators/sketches.py) still buys a hash check: the
# SQL-exact parts (label counts, totals — i.e. the whole feature
# derivation) are emitted verbatim, and the prediction-dependent parts
# collapse to asserted flags the oracle emits as `true`. The per-user
# verdict and confusion-matrix shapes stay available as
# ml.train_score_users / ml.holdout_eval for the golden pytests.
_FEAT_LABEL_SQL = """
      SELECT user_id,
             CAST(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
                  / count(*) > 0.25 AS INT) AS label
      FROM events GROUP BY user_id
"""

register(
    "m1_train_score_users",
    ml.train_score_checked,
    sql=f"""
    WITH per_user AS ({_FEAT_LABEL_SQL})
    SELECT label, count(*) AS n_users, true AS acc_ge_prior
    FROM per_user GROUP BY label
    """,
    tags=("ml", "train", "score"),
)
register(
    "m3_holdout_eval",
    ml.holdout_eval_checked,
    sql=f"""
    WITH per_user AS ({_FEAT_LABEL_SQL})
    SELECT CAST(count(*) AS BIGINT) AS n_users_total,
           true AS split_ok, true AS acc_ok
    FROM per_user
    """,
    tags=("ml", "eval"),
)


# fold membership and label mix are SQL-exact; accuracy rides as a
# bound-assertion flag (same soundness argument as m3)
register(
    "m4_kfold_eval",
    ml.kfold_eval_checked,
    sql=f"""
    WITH per_user AS ({_FEAT_LABEL_SQL}
    ), folds AS (
      SELECT label,
             CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % {ml.N_FOLDS} AS fold
      FROM per_user
    )
    SELECT fold, CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(label) AS BIGINT) AS n_pos,
           true AS acc_ok
    FROM folds GROUP BY fold
    """,
    tags=("ml", "cross-validation"),
)
