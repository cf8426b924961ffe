"""Registrations: ML train/score parity ops (SURVEY.md §2.10)."""

from __future__ import annotations

from .operators import ml
from .registry import register

# Fixture derivation is fully SQL-expressible — hash-checked.
register(
    "m0_label_distribution",
    ml.label_distribution,
    sql=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
                  / count(*) > {ml.LABEL_ERROR_RATIO} AS INT) AS label
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
_FEAT_LABEL_SQL = f"""
      SELECT user_id,
             CAST(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
                  / count(*) > {ml.LABEL_ERROR_RATIO} AS INT) AS label
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


# the gradient recurrence is plain SQL, so the trained weights — not
# just the fixture — are hash-checked; three unrolled steps mirror
# ml.LOGREG_ITERS exactly, constants interpolated from the module
_LOGREG_U = f"""
      SELECT ln(1.0 + sum(CASE WHEN event_type IN ('view', 'click')
                          THEN 1 ELSE 0 END)) AS x1,
             ln(1.0 + sum(CASE WHEN event_type IN ('view', 'click')
                          THEN value ELSE 0 END)) AS x2,
             CAST(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       AS DOUBLE) / count(*) > {ml.LABEL_ERROR_RATIO} AS DOUBLE) AS y
      FROM events GROUP BY user_id
"""

register(
    "m5_logreg_gd",
    ml.logreg_gd_train,
    sql=f"""
    WITH u AS ({_LOGREG_U}),
    i1 AS (
      SELECT {ml.LOGREG_LR} * avg(y - 0.5) AS wb,
             {ml.LOGREG_LR} * avg((y - 0.5) * x1) AS w1,
             {ml.LOGREG_LR} * avg((y - 0.5) * x2) AS w2
      FROM u
    ),
    i2 AS (
      SELECT any_value(wb) + {ml.LOGREG_LR} * avg(
               y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) AS wb,
             any_value(w1) + {ml.LOGREG_LR} * avg(
               (y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) * x1) AS w1,
             any_value(w2) + {ml.LOGREG_LR} * avg(
               (y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) * x2) AS w2
      FROM u, i1
    ),
    i3 AS (
      SELECT any_value(wb) + {ml.LOGREG_LR} * avg(
               y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) AS wb,
             any_value(w1) + {ml.LOGREG_LR} * avg(
               (y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) * x1) AS w1,
             any_value(w2) + {ml.LOGREG_LR} * avg(
               (y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) * x2) AS w2
      FROM u, i2
    ),
    scored AS (
      SELECT y,
             CASE WHEN 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2))) >= 0.5
                  THEN 1 ELSE 0 END AS pred,
             wb, w1, w2
      FROM u, i3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(any_value(wb), 4) AS w_bias,
           round(any_value(w1), 4) AS w_x1,
           round(any_value(w2), 4) AS w_x2,
           CAST(sum(pred * y) AS BIGINT) AS tp,
           CAST(sum(pred * (1 - y)) AS BIGINT) AS fp,
           CAST(sum((1 - pred) * y) AS BIGINT) AS fn,
           CAST(sum((1 - pred) * (1 - y)) AS BIGINT) AS tn
    FROM scored
    """,
    tags=("ml", "logistic-regression", "iterative", "gradient-descent"),
)


# training IS one grouped aggregate; scoring replays the identical
# log-posterior comparison — parameters AND confusion counts hash-match
register(
    "m6_gaussian_nb",
    ml.gaussian_nb_train_score,
    sql=f"""
    WITH u AS ({_LOGREG_U}),
    params AS (
      SELECT y, count(*) AS n,
             avg(x1) AS m1,
             greatest(coalesce(var_samp(x1), 0.0), {ml.NB_VAR_EPS}) AS v1,
             avg(x2) AS m2,
             greatest(coalesce(var_samp(x2), 0.0), {ml.NB_VAR_EPS}) AS v2
      FROM u GROUP BY y
    ), p AS (
      SELECT sum(n) AS n_all,
             max(CASE WHEN y = 1 THEN n END) AS n_p,
             max(CASE WHEN y = 1 THEN m1 END) AS m1_p,
             max(CASE WHEN y = 1 THEN v1 END) AS v1_p,
             max(CASE WHEN y = 1 THEN m2 END) AS m2_p,
             max(CASE WHEN y = 1 THEN v2 END) AS v2_p,
             max(CASE WHEN y = 0 THEN n END) AS n_n,
             max(CASE WHEN y = 0 THEN m1 END) AS m1_n,
             max(CASE WHEN y = 0 THEN v1 END) AS v1_n,
             max(CASE WHEN y = 0 THEN m2 END) AS m2_n,
             max(CASE WHEN y = 0 THEN v2 END) AS v2_n
      FROM params
    ), scored AS (
      SELECT y,
             CASE WHEN
               ln(n_p / n_all) - 0.5 * ln(v1_p)
                 - (x1 - m1_p) * (x1 - m1_p) / (2 * v1_p)
                 - 0.5 * ln(v2_p)
                 - (x2 - m2_p) * (x2 - m2_p) / (2 * v2_p)
               >
               ln(n_n / n_all) - 0.5 * ln(v1_n)
                 - (x1 - m1_n) * (x1 - m1_n) / (2 * v1_n)
                 - 0.5 * ln(v2_n)
                 - (x2 - m2_n) * (x2 - m2_n) / (2 * v2_n)
             THEN 1 ELSE 0 END AS pred,
             m1_p, v1_p, m1_n, v1_n
      FROM u, p
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(any_value(m1_p), 4) AS mean_x1_bot,
           round(any_value(v1_p), 4) AS var_x1_bot,
           round(any_value(m1_n), 4) AS mean_x1_ok,
           round(any_value(v1_n), 4) AS var_x1_ok,
           CAST(sum(pred * y) AS BIGINT) AS tp,
           CAST(sum(pred * (1 - y)) AS BIGINT) AS fp,
           CAST(sum((1 - pred) * y) AS BIGINT) AS fn,
           CAST(sum((1 - pred) * (1 - y)) AS BIGINT) AS tn
    FROM scored
    """,
    tags=("ml", "naive-bayes", "train", "score"),
)


# --- M7: k-means (Lloyd), the third hash-exact trainer -------------
# The oracle replays the IDENTICAL unrolled recurrence: deterministic
# min-user_id init, least-index-argmin assignment (same CASE text as
# the Spark side's when-chain), conditional-avg centroid update with
# empty-cluster carry-over. Three a/c CTE rounds mirror
# ml.KMEANS_ITERS exactly.
_KM_U = """
      SELECT user_id,
             ln(1.0 + sum(CASE WHEN event_type IN ('view', 'click')
                          THEN 1 ELSE 0 END)) AS x1,
             ln(1.0 + sum(CASE WHEN event_type IN ('view', 'click')
                          THEN value ELSE 0 END)) AS x2
      FROM events GROUP BY user_id
"""


def _km_d(i: int) -> str:
    return f"((x1 - cx{i}) * (x1 - cx{i}) + (x2 - cy{i}) * (x2 - cy{i}))"


_KM_ASSIGN = (
    f"CASE WHEN {_km_d(0)} <= {_km_d(1)} AND {_km_d(0)} <= {_km_d(2)} THEN 0 "
    f"WHEN {_km_d(1)} <= {_km_d(2)} THEN 1 ELSE 2 END"
)

_KM_STEP = ",\n             ".join(
    f"coalesce(avg(CASE WHEN cl = {i} THEN x1 END), any_value(cx{i})) AS cx{i},\n"
    f"             coalesce(avg(CASE WHEN cl = {i} THEN x2 END),"
    f" any_value(cy{i})) AS cy{i}"
    for i in range(ml.KMEANS_K)
)

_KM_INIT = ",\n             ".join(
    f"max(CASE WHEN rn = {i + 1} THEN x1 END) AS cx{i},\n"
    f"             max(CASE WHEN rn = {i + 1} THEN x2 END) AS cy{i}"
    for i in range(ml.KMEANS_K)
)

register(
    "m7_kmeans_lloyd",
    ml.kmeans_lloyd_train,
    sql=f"""
    WITH u AS ({_KM_U}),
    c0 AS (
      SELECT {_KM_INIT}
      FROM (SELECT x1, x2, row_number() OVER (ORDER BY user_id) AS rn
            FROM u ORDER BY user_id LIMIT {ml.KMEANS_K})
    ),
    a1 AS (SELECT u.*, c0.*, {_KM_ASSIGN} AS cl FROM u, c0),
    c1 AS (SELECT {_KM_STEP} FROM a1),
    a2 AS (SELECT u.*, c1.*, {_KM_ASSIGN} AS cl FROM u, c1),
    c2 AS (SELECT {_KM_STEP} FROM a2),
    a3 AS (SELECT u.*, c2.*, {_KM_ASSIGN} AS cl FROM u, c2),
    c3 AS (SELECT {_KM_STEP} FROM a3),
    scored AS (
      SELECT u.*, c3.*, {_KM_ASSIGN} AS cl,
             least({_km_d(0)}, {_km_d(1)}, {_km_d(2)}) AS best
      FROM u, c3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN cl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c0,
           CAST(sum(CASE WHEN cl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_c1,
           CAST(sum(CASE WHEN cl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_c2,
           round(any_value(cx0), 4) AS cx0, round(any_value(cy0), 4) AS cy0,
           round(any_value(cx1), 4) AS cx1, round(any_value(cy1), 4) AS cy1,
           round(any_value(cx2), 4) AS cx2, round(any_value(cy2), 4) AS cy2,
           round(sum(best), 2) AS inertia
    FROM scored
    """,
    tags=("ml", "kmeans", "clustering", "iterative"),
)


# the normal-equation solve is pure arithmetic over nine moments; the
# Cramer formula STRINGS are shared with the Spark side (ml.RIDGE_DET*)
# so both engines evaluate the identical expression tree
register(
    "m8_ridge_normal_eq",
    ml.ridge_normal_eq,
    sql=f"""
    WITH m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             avg(l_quantity) AS m1,
             avg(l_discount) AS m2,
             avg(l_extendedprice) AS my,
             avg(l_quantity * l_quantity) AS s11,
             avg(l_quantity * l_discount) AS s12,
             avg(l_discount * l_discount) AS s22,
             avg(l_quantity * l_extendedprice) AS s1y,
             avg(l_discount * l_extendedprice) AS s2y
      FROM lineitem
    ), s AS (
      SELECT n_rows,
             ({ml.RIDGE_DET0}) / ({ml.RIDGE_DET}) AS b0,
             ({ml.RIDGE_DET1}) / ({ml.RIDGE_DET}) AS b1,
             ({ml.RIDGE_DET2}) / ({ml.RIDGE_DET}) AS b2
      FROM m
    )
    SELECT n_rows,
           round(b0, 4) AS b_intercept,
           round(b1, 4) AS b_quantity,
           round(b2, 4) AS b_discount,
           round(b0 + b1 * {ml.RIDGE_PROBE_QTY!r} + b2 * {ml.RIDGE_PROBE_DISC!r}, 2)
             AS pred_probe_price
    FROM s
    """,
    tags=("ml", "regression", "closed-form"),
)


# folds/smoothing interpolated from the module constants; the md5
# fold gate is the same shared expression as the corpus hash split
register(
    "m9_target_encode_kfold",
    ml.target_encode_kfold,
    sql=f"""
    WITH j AS (
      SELECT c_mktsegment AS segment, o_orderkey, o_totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey
    ), lab AS (
      SELECT segment,
             CAST(o_totalprice > (SELECT avg(o_totalprice) FROM j) AS BIGINT)
               AS y,
             CAST(CONCAT('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % {ml.TE_FOLDS} AS fold
      FROM j
    ), per AS (
      SELECT segment, fold, count(*) AS n_fold,
             CAST(sum(y) AS BIGINT) AS s_fold
      FROM lab GROUP BY 1, 2
    ), t AS (
      SELECT *,
             sum(n_fold) OVER (PARTITION BY segment) AS n_seg,
             sum(s_fold) OVER (PARTITION BY segment) AS s_seg,
             sum(n_fold) OVER (PARTITION BY fold) AS n_f,
             sum(s_fold) OVER (PARTITION BY fold) AS s_f,
             sum(n_fold) OVER () AS n_tot,
             sum(s_fold) OVER () AS s_tot
      FROM per
    )
    SELECT segment, fold, n_fold AS n_in_fold,
           CAST(n_seg - n_fold AS BIGINT) AS n_out_fold,
           round((s_tot - s_f) * 1.0 / (n_tot - n_f), 6) AS prior_oof,
           round(((s_seg - s_fold) + {ml.TE_SMOOTH}
                    * ((s_tot - s_f) * 1.0 / (n_tot - n_f)))
                 / ((n_seg - n_fold) + {ml.TE_SMOOTH}), 6) AS enc
    FROM t
    """,
    tags=("ml", "target-encoding", "kfold", "training-data"),
)


# same md5 row gate, the SAME Cramer formula strings as m8, cents-
# rounded residuals before the order statistic; DuckDB's row_number
# replays the distributed two-phase k-th smallest
register(
    "m10_conformal_interval",
    ml.conformal_interval,
    sql=f"""
    WITH r0 AS (
      SELECT l_quantity AS x1, l_discount AS x2, l_extendedprice AS y,
             CAST(CONCAT('0x', substr(md5(CONCAT(l_orderkey, '-',
                                               l_linenumber)), 1, 8))
                  AS BIGINT) % 100 AS bkt
      FROM lineitem
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_train,
             avg(x1) AS m1, avg(x2) AS m2, avg(y) AS my,
             avg(x1 * x1) AS s11, avg(x1 * x2) AS s12,
             avg(x2 * x2) AS s22, avg(x1 * y) AS s1y, avg(x2 * y) AS s2y
      FROM r0 WHERE bkt < {ml.CONF_TRAIN_PCT}
    ), coef AS (
      SELECT n_train,
             ({ml.RIDGE_DET0}) / ({ml.RIDGE_DET}) AS b0,
             ({ml.RIDGE_DET1}) / ({ml.RIDGE_DET}) AS b1,
             ({ml.RIDGE_DET2}) / ({ml.RIDGE_DET}) AS b2
      FROM m
    ), cal AS (
      SELECT round(abs(y - (b0 + b1 * x1 + b2 * x2)), 2) AS r
      FROM r0, coef
      WHERE bkt >= {ml.CONF_TRAIN_PCT} AND bkt < {ml.CONF_CAL_PCT}
    ), nc AS (
      SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal
    ), ranked AS (
      SELECT r, row_number() OVER (ORDER BY r) AS rn FROM cal
    ), qh AS (
      SELECT nc.n_cal,
             CAST(ceil((nc.n_cal + 1) * {1.0 - ml.CONF_ALPHA}) AS BIGINT) AS k,
             ranked.r AS q_hat
      FROM ranked, nc
      WHERE ranked.rn = CAST(ceil((nc.n_cal + 1) * {1.0 - ml.CONF_ALPHA})
                             AS BIGINT)
    ), test AS (
      SELECT coef.n_train, qh.n_cal, qh.k, qh.q_hat,
             CAST(round(abs(y - (b0 + b1 * x1 + b2 * x2)), 2) <= qh.q_hat
                  AS INT) AS cov
      FROM r0, coef, qh
      WHERE bkt >= {ml.CONF_CAL_PCT}
    )
    SELECT n_train, n_cal, CAST(count(*) AS BIGINT) AS n_test, k,
           round(q_hat, 2) AS q_hat,
           round(avg(cov), 6) AS coverage,
           {ml.CONF_ALPHA} AS alpha
    FROM test GROUP BY n_train, n_cal, k, q_hat
    """,
    tags=("ml", "conformal", "uncertainty", "prefix-sum"),
)


# m5's identical i1-i3 weight recurrence, then the tie-corrected
# rank-sum AUC on the 1e-6-rounded linear score
register(
    "m11_auc_logreg",
    ml.logreg_auc,
    sql=f"""
    WITH u AS ({_LOGREG_U}),
    i1 AS (
      SELECT {ml.LOGREG_LR} * avg(y - 0.5) AS wb,
             {ml.LOGREG_LR} * avg((y - 0.5) * x1) AS w1,
             {ml.LOGREG_LR} * avg((y - 0.5) * x2) AS w2
      FROM u
    ),
    i2 AS (
      SELECT any_value(wb) + {ml.LOGREG_LR} * avg(
               y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) AS wb,
             any_value(w1) + {ml.LOGREG_LR} * avg(
               (y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) * x1) AS w1,
             any_value(w2) + {ml.LOGREG_LR} * avg(
               (y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) * x2) AS w2
      FROM u, i1
    ),
    i3 AS (
      SELECT any_value(wb) + {ml.LOGREG_LR} * avg(
               y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) AS wb,
             any_value(w1) + {ml.LOGREG_LR} * avg(
               (y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) * x1) AS w1,
             any_value(w2) + {ml.LOGREG_LR} * avg(
               (y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) * x2) AS w2
      FROM u, i2
    ),
    scored AS (
      SELECT round(wb + w1 * x1 + w2 * x2, 6) AS z, y
      FROM u, i3
    ), per_value AS (
      SELECT z, count(*) AS cnt, sum(y) AS pos FROM scored GROUP BY z
    ), cum AS (
      SELECT cnt, pos,
             coalesce(sum(cnt) OVER (ORDER BY z
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM per_value
    ), agg AS (
      SELECT sum(pos * (below + (cnt + 1) / 2.0)) AS rankpos,
             sum(pos) AS n1, sum(cnt) AS n
      FROM cum
    )
    SELECT CAST(n1 AS BIGINT) AS n_pos,
           CAST(n - n1 AS BIGINT) AS n_neg,
           round((rankpos - n1 * (n1 + 1) / 2.0) / (n1 * (n - n1)), 6)
             AS auc,
           round(2.0 * (rankpos - n1 * (n1 + 1) / 2.0) / (n1 * (n - n1))
                 - 1.0, 6) AS gini_index
    FROM agg
    """,
    tags=("ml", "auc", "evaluation", "prefix-sum"),
)


_ADA_T = "[" + ", ".join(str(t) for t in ml.ADA_THRESHOLDS) + "]"
_ADA_CLAMP = f"greatest(least({{e}}, 1 - {ml.ADA_EPS}), {ml.ADA_EPS})"


def _ada_sql() -> str:
    """DuckDB replay of the identical two-round AdaBoost recurrence:
    same candidate grid and ids, same rounded argmin, same clamp."""
    c1 = _ADA_CLAMP.format(e="b1.err")
    c2 = _ADA_CLAMP.format(e="b2.err")
    return f"""
    WITH u AS (
      SELECT x1, x2, CAST(2 * y - 1 AS DOUBLE) AS s FROM ({_LOGREG_U})
    ), cands AS (
      SELECT row_number() OVER (ORDER BY f, t, p DESC) AS cand_id, f, t, p
      FROM (SELECT unnest([1, 2]) AS f),
           (SELECT unnest({_ADA_T}) AS t),
           (SELECT unnest([1, -1]) AS p)
    ), r1 AS (
      SELECT c.cand_id, c.f, c.t, c.p,
             avg(CASE WHEN (CASE WHEN (CASE WHEN c.f = 1 THEN u.x1
                                       ELSE u.x2 END) > c.t
                            THEN CAST(c.p AS DOUBLE)
                            ELSE -CAST(c.p AS DOUBLE) END) <> u.s
                      THEN 1.0 ELSE 0.0 END) AS err
      FROM u, cands c GROUP BY 1, 2, 3, 4
    ), b1 AS (
      SELECT * FROM r1 ORDER BY round(err, 9), cand_id LIMIT 1
    ), a1 AS (
      SELECT b1.*, 0.5 * ln((1 - {c1}) / {c1}) AS alpha FROM b1
    ), wts AS (
      SELECT u.*,
             exp(-a1.alpha * u.s
                 * (CASE WHEN (CASE WHEN a1.f = 1 THEN u.x1
                               ELSE u.x2 END) > a1.t
                    THEN CAST(a1.p AS DOUBLE)
                    ELSE -CAST(a1.p AS DOUBLE) END)) AS uw
      FROM u, a1
    ), z AS (
      SELECT sum(uw) AS z FROM wts
    ), r2 AS (
      SELECT c.cand_id, c.f, c.t, c.p,
             sum(w.uw / z.z
                 * CASE WHEN (CASE WHEN (CASE WHEN c.f = 1 THEN w.x1
                                         ELSE w.x2 END) > c.t
                              THEN CAST(c.p AS DOUBLE)
                              ELSE -CAST(c.p AS DOUBLE) END) <> w.s
                        THEN 1.0 ELSE 0.0 END) AS err
      FROM wts w, z, cands c GROUP BY 1, 2, 3, 4
    ), b2 AS (
      SELECT * FROM r2 ORDER BY round(err, 9), cand_id LIMIT 1
    ), a2 AS (
      SELECT b2.*, 0.5 * ln((1 - {c2}) / {c2}) AS alpha FROM b2
    ), scored AS (
      SELECT u.s,
             a1.alpha * (CASE WHEN (CASE WHEN a1.f = 1 THEN u.x1
                                    ELSE u.x2 END) > a1.t
                         THEN CAST(a1.p AS DOUBLE)
                         ELSE -CAST(a1.p AS DOUBLE) END)
             + a2.alpha * (CASE WHEN (CASE WHEN a2.f = 1 THEN u.x1
                                      ELSE u.x2 END) > a2.t
                           THEN CAST(a2.p AS DOUBLE)
                           ELSE -CAST(a2.p AS DOUBLE) END) AS margin
      FROM u, a1, a2
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM u) AS n_users,
           (SELECT CAST(f AS BIGINT) FROM a1) AS f1,
           (SELECT round(t, 2) FROM a1) AS t1,
           (SELECT CAST(p AS BIGINT) FROM a1) AS p1,
           (SELECT round(err, 6) FROM a1) AS err1,
           (SELECT round(alpha, 6) FROM a1) AS alpha1,
           (SELECT CAST(f AS BIGINT) FROM a2) AS f2,
           (SELECT round(t, 2) FROM a2) AS t2,
           (SELECT CAST(p AS BIGINT) FROM a2) AS p2,
           (SELECT round(err, 6) FROM a2) AS err2,
           (SELECT round(alpha, 6) FROM a2) AS alpha2,
           round(avg(CASE WHEN (CASE WHEN margin >= 0 THEN 1.0
                               ELSE -1.0 END) = s
                     THEN 1.0 ELSE 0.0 END), 6) AS train_acc
    FROM scored
    """


register(
    "m12_adaboost_stumps",
    ml.adaboost_stumps,
    sql=_ada_sql(),
    tags=("ml", "boosting", "iterative", "exact-trainer"),
)


# the identical i1-i3 weight replay, probabilities rounded before
# binning; ECE as the n-weighted |gap| sum over the bin rows
register(
    "m13_calibration_bins",
    ml.calibration_bins,
    sql=f"""
    WITH u AS ({_LOGREG_U}),
    i1 AS (
      SELECT {ml.LOGREG_LR} * avg(y - 0.5) AS wb,
             {ml.LOGREG_LR} * avg((y - 0.5) * x1) AS w1,
             {ml.LOGREG_LR} * avg((y - 0.5) * x2) AS w2
      FROM u
    ),
    i2 AS (
      SELECT any_value(wb) + {ml.LOGREG_LR} * avg(
               y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) AS wb,
             any_value(w1) + {ml.LOGREG_LR} * avg(
               (y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) * x1) AS w1,
             any_value(w2) + {ml.LOGREG_LR} * avg(
               (y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) * x2) AS w2
      FROM u, i1
    ),
    i3 AS (
      SELECT any_value(wb) + {ml.LOGREG_LR} * avg(
               y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) AS wb,
             any_value(w1) + {ml.LOGREG_LR} * avg(
               (y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) * x1) AS w1,
             any_value(w2) + {ml.LOGREG_LR} * avg(
               (y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) * x2) AS w2
      FROM u, i2
    ),
    scored AS (
      SELECT round(1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2))), 6) AS prob,
             y
      FROM u, i3
    ), binned AS (
      SELECT least(CAST(floor(prob * {ml.CALIB_BINS}) AS BIGINT),
                   {ml.CALIB_BINS - 1}) AS bin,
             prob, y
      FROM scored
    ), g AS (
      SELECT bin, count(*) AS n, avg(prob) AS mean_prob_raw,
             avg(y) AS pos_rate_raw
      FROM binned GROUP BY bin
    ), t AS (
      SELECT *, sum(n) OVER () AS n_total FROM g
    )
    SELECT bin, CAST(n AS BIGINT) AS n,
           round(mean_prob_raw, 6) AS mean_prob,
           round(pos_rate_raw, 6) AS pos_rate,
           round(abs(mean_prob_raw - pos_rate_raw), 6) AS calib_gap,
           round(sum(abs(mean_prob_raw - pos_rate_raw) * n / n_total)
                 OVER (), 6) AS ece
    FROM t
    """,
    tags=("ml", "calibration", "evaluation"),
)


register(
    "m14_cohens_kappa",
    ml.cohens_kappa,
    sql=f"""
    WITH u AS ({_LOGREG_U}),
    i1 AS (
      SELECT {ml.LOGREG_LR} * avg(y - 0.5) AS wb,
             {ml.LOGREG_LR} * avg((y - 0.5) * x1) AS w1,
             {ml.LOGREG_LR} * avg((y - 0.5) * x2) AS w2
      FROM u
    ),
    i2 AS (
      SELECT any_value(wb) + {ml.LOGREG_LR} * avg(
               y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) AS wb,
             any_value(w1) + {ml.LOGREG_LR} * avg(
               (y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) * x1) AS w1,
             any_value(w2) + {ml.LOGREG_LR} * avg(
               (y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) * x2) AS w2
      FROM u, i1
    ),
    i3 AS (
      SELECT any_value(wb) + {ml.LOGREG_LR} * avg(
               y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) AS wb,
             any_value(w1) + {ml.LOGREG_LR} * avg(
               (y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) * x1) AS w1,
             any_value(w2) + {ml.LOGREG_LR} * avg(
               (y - 1.0 / (1.0 + exp(-(wb + w1 * x1 + w2 * x2)))) * x2) AS w2
      FROM u, i2
    ),
    cells AS (
      SELECT count(*) AS n,
             sum(CASE WHEN 1.0 / (1.0 + exp(-(wb + w1*x1 + w2*x2))) >= 0.5
                       AND y = 1 THEN 1 ELSE 0 END) AS tp,
             sum(CASE WHEN 1.0 / (1.0 + exp(-(wb + w1*x1 + w2*x2))) >= 0.5
                       AND y = 0 THEN 1 ELSE 0 END) AS fp,
             sum(CASE WHEN 1.0 / (1.0 + exp(-(wb + w1*x1 + w2*x2))) < 0.5
                       AND y = 1 THEN 1 ELSE 0 END) AS fn,
             sum(CASE WHEN 1.0 / (1.0 + exp(-(wb + w1*x1 + w2*x2))) < 0.5
                       AND y = 0 THEN 1 ELSE 0 END) AS tn
      FROM u, i3
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           round((tp + tn) * 1.0 / n, 6) AS observed_agreement,
           round(((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn))
                 * 1.0 / (n * n), 6) AS chance_agreement,
           round(((tp + tn) * 1.0 / n
                  - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn))
                    * 1.0 / (n * n))
                 / (1 - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn))
                        * 1.0 / (n * n)), 6) AS kappa
    FROM cells
    """,
    tags=("ml", "kappa", "evaluation"),
)
