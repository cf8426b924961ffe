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


def test_model_persistence_roundtrip(spark, sf_dir):
    """Save/load the trained pipeline (the production pattern the
    reference lacks — it retrains on every consumer start,
    ConsumerESFinal.scala:61-67) and verify identical predictions."""
    import tempfile

    from pyspark.ml import PipelineModel

    from real_time_big_data_analytics_spark.operators.ml import (
        train_decision_tree,
        user_activity_features,
    )

    data = user_activity_features(spark, sf_dir)
    model = train_decision_tree(data)
    with tempfile.TemporaryDirectory(prefix="rtba_model_") as d:
        path = f"{d}/dt_pipeline"
        model.write().overwrite().save(path)
        loaded = PipelineModel.load(path)
        a = {(r.user_id, r.prediction) for r in model.transform(data).select("user_id", "prediction").collect()}
        b = {(r.user_id, r.prediction) for r in loaded.transform(data).select("user_id", "prediction").collect()}
        assert a == b


def test_kfold_partitions_users_and_clears_bound(spark, sf_dir):
    from real_time_big_data_analytics_spark.operators.ml import (
        kfold_eval_checked,
        user_activity_features,
    )

    rows = sorted(kfold_eval_checked(spark, sf_dir).collect())
    total = user_activity_features(spark, sf_dir).count()
    assert [r.fold for r in rows] == [0, 1, 2]
    assert sum(r.n_users for r in rows) == total  # folds partition users
    for r in rows:
        assert r.acc_ok, r.fold
        assert 0 <= r.n_pos <= r.n_users


def test_logreg_gd_matches_numpy(spark, sf_dir):
    """Replay the exact unrolled recurrence in numpy and require the
    rounded weights to agree — catches any drift between the Spark
    plan and the documented algorithm."""
    import numpy as np

    from real_time_big_data_analytics_spark.operators.ml import (
        LOGREG_ITERS,
        LOGREG_LR,
        logreg_gd_features,
        logreg_gd_train,
    )

    row = logreg_gd_train(spark, sf_dir).collect()[0]
    feats = logreg_gd_features(spark, sf_dir).toPandas()
    X = np.column_stack(
        [np.ones(len(feats)), feats.x1.to_numpy(), feats.x2.to_numpy()]
    )
    y = feats.y.to_numpy()
    w = np.zeros(3)
    for _ in range(LOGREG_ITERS):
        p = 1.0 / (1.0 + np.exp(-X @ w))
        w = w + LOGREG_LR * X.T @ (y - p) / len(y)
    assert abs(row.w_bias - w[0]) < 1e-3
    assert abs(row.w_x1 - w[1]) < 1e-3
    assert abs(row.w_x2 - w[2]) < 1e-3
    # confusion matrix partitions the users
    assert row.tp + row.fp + row.fn + row.tn == row.n_users == len(feats)
    p = 1.0 / (1.0 + np.exp(-X @ w))
    assert row.tp + row.fn == int(y.sum())
    assert row.tp + row.fp == int((p >= 0.5).sum())


def test_gaussian_nb_matches_numpy(spark, sf_dir):
    import numpy as np

    from real_time_big_data_analytics_spark.operators.ml import (
        gaussian_nb_train_score,
        logreg_gd_features,
    )

    row = gaussian_nb_train_score(spark, sf_dir).collect()[0]
    feats = logreg_gd_features(spark, sf_dir).toPandas()
    X = feats[["x1", "x2"]].to_numpy()
    y = feats.y.to_numpy()
    preds = []
    lls = {}
    from real_time_big_data_analytics_spark.operators.ml import NB_VAR_EPS

    for cls in (0.0, 1.0):
        Xc = X[y == cls]
        prior = len(Xc) / len(X)
        mu = Xc.mean(0)
        var = np.maximum(np.nan_to_num(Xc.var(0, ddof=1)), NB_VAR_EPS)
        lls[cls] = (
            np.log(prior)
            - 0.5 * np.log(var).sum()
            - ((X - mu) ** 2 / (2 * var)).sum(1)
        )
    pred = (lls[1.0] > lls[0.0]).astype(int)
    tp = int(((pred == 1) & (y == 1)).sum())
    fp = int(((pred == 1) & (y == 0)).sum())
    fn = int(((pred == 0) & (y == 1)).sum())
    tn = int(((pred == 0) & (y == 0)).sum())
    assert (row.tp, row.fp, row.fn, row.tn) == (tp, fp, fn, tn)
    assert row.n_users == len(X)
    mu1 = X[y == 1].mean(0)
    var1 = np.maximum(np.nan_to_num(X[y == 1].var(0, ddof=1)), NB_VAR_EPS)
    assert abs(row.mean_x1_bot - mu1[0]) < 1e-3
    assert abs(row.var_x1_bot - var1[0]) < 1e-3
    # NB should beat the all-negative trivial classifier's recall
    assert row.tp + row.fn > 0


def test_kmeans_lloyd_matches_numpy(spark, sf_dir):
    """m7's unrolled Lloyd recurrence must equal an independent numpy
    replay: same min-user_id init, least-index argmin, empty-cluster
    carry-over — pins the ALGORITHM (the oracle pins cross-engine
    arithmetic)."""
    import numpy as np

    from real_time_big_data_analytics_spark.operators.ml import (
        KMEANS_ITERS,
        KMEANS_K,
        kmeans_lloyd_train,
        logreg_gd_features,
    )

    row = kmeans_lloyd_train(spark, sf_dir).collect()[0]
    feats = (
        logreg_gd_features(spark, sf_dir)
        .select("user_id", "x1", "x2")
        .toPandas()
        .sort_values("user_id")
    )
    X = feats[["x1", "x2"]].to_numpy()
    C = X[:KMEANS_K].copy()
    for _ in range(KMEANS_ITERS):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(2)
        cl = d.argmin(1)  # numpy argmin ties to lowest index, like the CASE
        for i in range(KMEANS_K):
            if (cl == i).any():
                C[i] = X[cl == i].mean(0)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(2)
    cl = d.argmin(1)
    sizes = [int((cl == i).sum()) for i in range(KMEANS_K)]
    assert row.n_users == len(X)
    assert [row.n_c0, row.n_c1, row.n_c2] == sizes
    for i in range(KMEANS_K):
        assert abs(row[f"cx{i}"] - C[i][0]) < 1e-3
        assert abs(row[f"cy{i}"] - C[i][1]) < 1e-3
    assert abs(row.inertia - d.min(1).sum()) < 0.05
    assert len({row.n_c0, row.n_c1, row.n_c2} - {0}) >= 2  # non-degenerate


def test_ridge_normal_eq_matches_numpy(spark, sf_dir):
    """m8's Cramer solve must equal numpy's lstsq on the regularized
    normal system built from the same raw rows — an independent
    implementation of the algorithm, not a replay of the formulas."""
    import numpy as np

    from real_time_big_data_analytics_spark.sources.tables import load_table

    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .toPandas()
    )
    X = np.column_stack(
        [np.ones(len(rows)), rows.l_quantity.to_numpy(), rows.l_discount.to_numpy()]
    ).astype(float)
    y = rows.l_extendedprice.to_numpy().astype(float)
    n = len(rows)
    A = X.T @ X / n + ml.RIDGE_LAMBDA * np.eye(3)
    b = X.T @ y / n
    expect = np.linalg.solve(A, b)

    got = ml.ridge_normal_eq(spark, sf_dir).first()
    assert got.n_rows == n
    for val, exp in zip(
        (got.b_intercept, got.b_quantity, got.b_discount), expect
    ):
        assert abs(val - exp) < 5e-4
    probe = expect[0] + expect[1] * ml.RIDGE_PROBE_QTY + expect[2] * ml.RIDGE_PROBE_DISC
    assert abs(got.pred_probe_price - probe) < 0.05


def test_target_encode_kfold_is_leakage_free(spark, sf_dir):
    """Each (segment, fold) encoding must equal a pandas replay built
    ONLY from the complement folds — the leakage-safety property — and
    fold sizes must partition each segment."""
    from real_time_big_data_analytics_spark.operators import ml
    from real_time_big_data_analytics_spark.sources.tables import load_table

    rows = ml.target_encode_kfold(spark, sf_dir).collect()

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).toPandas()
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).toPandas()
    import hashlib

    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    # threshold from the engine: pandas' pairwise-summed mean differs
    # in last ulps and can flip a boundary row's label; the property
    # under test is the K-fold complement arithmetic, not summation
    # order (that is the oracle check's job)
    import pyspark.sql.functions as F

    so = load_table(spark, sf_dir, "orders")
    sc = load_table(spark, sf_dir, "customer")
    gm = (
        so.join(sc, so.o_custkey == sc.c_custkey)
        .agg(F.avg("o_totalprice"))
        .first()[0]
    )
    j["y"] = (j.o_totalprice > gm).astype(int)
    j["fold"] = [
        int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % ml.TE_FOLDS
        for k in j.o_orderkey
    ]
    m = ml.TE_SMOOTH
    for r in rows:
        seg = j[j.c_mktsegment == r.segment]
        infold = seg[seg.fold == r.fold]
        out = seg[seg.fold != r.fold]
        oof_global = j[j.fold != r.fold]
        prior = oof_global.y.mean()
        enc = (out.y.sum() + m * prior) / (len(out) + m)
        assert r.n_in_fold == len(infold)
        assert r.n_out_fold == len(out)
        assert abs(r.prior_oof - prior) < 1e-5
        assert abs(r.enc - enc) < 1e-5
    # folds partition each segment
    import collections

    per_seg = collections.defaultdict(int)
    for r in rows:
        per_seg[r.segment] += r.n_in_fold
    for seg, tot in per_seg.items():
        assert tot == (j.c_mktsegment == seg).sum()


def test_conformal_interval_guarantee_and_replay(spark, sf_dir):
    """q_hat and coverage must equal a numpy replay of the same
    split-fit-calibrate-audit pipeline, and the finite-sample
    conformal property must hold: empirical calibration coverage of
    pred +/- q_hat is >= 1 - alpha by construction."""
    import hashlib
    import math

    import numpy as np

    from real_time_big_data_analytics_spark.operators import ml
    from real_time_big_data_analytics_spark.sources.tables import load_table

    r = ml.conformal_interval(spark, sf_dir).first()

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_extendedprice",
    ).toPandas()
    bkt = np.array(
        [
            int(hashlib.md5(f"{o}-{ln}".encode()).hexdigest()[:8], 16) % 100
            for o, ln in zip(li.l_orderkey, li.l_linenumber)
        ]
    )
    X = li[["l_quantity", "l_discount"]].to_numpy(dtype=float)
    y = li.l_extendedprice.to_numpy(dtype=float)
    tr = bkt < ml.CONF_TRAIN_PCT
    ca = (bkt >= ml.CONF_TRAIN_PCT) & (bkt < ml.CONF_CAL_PCT)
    te = bkt >= ml.CONF_CAL_PCT
    A = np.hstack([np.ones((tr.sum(), 1)), X[tr]])
    n = tr.sum()
    G = A.T @ A / n + ml.RIDGE_LAMBDA * np.eye(3)
    b = np.linalg.solve(G, A.T @ y[tr] / n)
    pred = lambda m: b[0] + X[m] @ b[1:]
    r_cal = np.sort(np.round(np.abs(y[ca] - pred(ca)), 2))
    k = math.ceil((ca.sum() + 1) * (1 - ml.CONF_ALPHA))
    q = r_cal[k - 1]
    cov = float(np.mean(np.round(np.abs(y[te] - pred(te)), 2) <= q))
    assert (r.n_train, r.n_cal, r.n_test) == (tr.sum(), ca.sum(), te.sum())
    assert r.k == k
    assert abs(r.q_hat - q) < 0.02
    assert abs(r.coverage - cov) < 1e-4
    # conformal guarantee on the calibration set by construction
    assert np.mean(r_cal <= r.q_hat) >= 1 - ml.CONF_ALPHA - 1e-9
    # and the audited test coverage should be near 1 - alpha
    assert r.coverage > 1 - ml.CONF_ALPHA - 0.05


def test_logreg_auc_matches_sklearn_free_replay(spark, sf_dir):
    """AUC must equal a numpy rank-based replay on the same rounded
    scores, sit in [0, 1], and beat 0.5 (the features carry signal)."""
    import numpy as np

    from real_time_big_data_analytics_spark.operators import ml

    r = ml.logreg_auc(spark, sf_dir).first()
    feats = ml.logreg_gd_features(spark, sf_dir).toPandas()
    X = np.column_stack([np.ones(len(feats)), feats.x1, feats.x2])
    y = feats.y.to_numpy(dtype=float)
    w = np.zeros(3)
    for _ in range(ml.LOGREG_ITERS):
        p = 1.0 / (1.0 + np.exp(-X @ w))
        w = w + ml.LOGREG_LR * X.T @ (y - p) / len(y)
    z = np.round(X @ w, 6)
    # midranks via argsort + tie averaging
    order = np.argsort(z, kind="mergesort")
    ranks = np.empty(len(z))
    i = 0
    zs = z[order]
    while i < len(zs):
        j = i
        while j < len(zs) and zs[j] == zs[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    n1 = int(y.sum())
    n0 = len(y) - n1
    auc = (ranks[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
    assert (r.n_pos, r.n_neg) == (n1, n0)
    assert abs(r.auc - auc) < 1e-5
    assert abs(r.gini_index - (2 * auc - 1)) < 2e-5
    assert 0.5 < r.auc <= 1.0


def test_adaboost_stumps_matches_numpy_replay(spark, sf_dir):
    """Both chosen stumps, alphas, and ensemble accuracy must equal a
    numpy AdaBoost replay over the same candidate grid; round-2 error
    must improve on chance and alphas must be positive."""
    import numpy as np

    from real_time_big_data_analytics_spark.operators import ml

    r = ml.adaboost_stumps(spark, sf_dir).first()
    feats = ml.logreg_gd_features(spark, sf_dir).toPandas()
    X = feats[["x1", "x2"]].to_numpy(dtype=float)
    s = (2 * feats.y.to_numpy(dtype=float) - 1)
    cands = []
    cid = 0
    for f in (1, 2):
        for t in ml.ADA_THRESHOLDS:
            for p in (1, -1):
                cid += 1
                cands.append((cid, f, t, p))

    def h(f, t, p):
        return np.where(X[:, f - 1] > t, float(p), -float(p))

    w = np.full(len(s), 1.0 / len(s))
    chosen = []
    for _ in range(2):
        best = min(
            cands,
            key=lambda c: (round(float(w @ (h(c[1], c[2], c[3]) != s)), 9), c[0]),
        )
        e = float(w @ (h(best[1], best[2], best[3]) != s))
        e_c = min(max(e, ml.ADA_EPS), 1 - ml.ADA_EPS)
        a = 0.5 * np.log((1 - e_c) / e_c)
        chosen.append((best, e, a))
        w = w * np.exp(-a * s * h(best[1], best[2], best[3]))
        w = w / w.sum()
    (b1, e1, a1), (b2, e2, a2) = chosen
    assert (r.f1, r.p1) == (b1[1], b1[3]) and abs(r.t1 - b1[2]) < 1e-9
    assert (r.f2, r.p2) == (b2[1], b2[3]) and abs(r.t2 - b2[2]) < 1e-9
    assert abs(r.err1 - e1) < 1e-5 and abs(r.err2 - e2) < 1e-5
    assert abs(r.alpha1 - a1) < 1e-4 and abs(r.alpha2 - a2) < 1e-4
    margin = a1 * h(b1[1], b1[2], b1[3]) + a2 * h(b2[1], b2[2], b2[3])
    acc = float(np.mean(np.where(margin >= 0, 1.0, -1.0) == s))
    assert abs(r.train_acc - acc) < 1e-5
    assert r.err1 < 0.5 and r.err2 < 0.5  # weak learners beat chance
    assert r.alpha1 > 0 and r.alpha2 > 0


def test_calibration_bins_matches_numpy_replay(spark, sf_dir):
    """Bin stats and ECE must equal a numpy replay; ECE must satisfy
    its definition as the n-weighted mean |gap|."""
    import numpy as np

    from real_time_big_data_analytics_spark.operators import ml

    rows = {r.bin: r for r in ml.calibration_bins(spark, sf_dir).collect()}
    feats = ml.logreg_gd_features(spark, sf_dir).toPandas()
    X = np.column_stack([np.ones(len(feats)), feats.x1, feats.x2])
    y = feats.y.to_numpy(dtype=float)
    w = np.zeros(3)
    for _ in range(ml.LOGREG_ITERS):
        p = 1.0 / (1.0 + np.exp(-X @ w))
        w = w + ml.LOGREG_LR * X.T @ (y - p) / len(y)
    prob = np.round(1.0 / (1.0 + np.exp(-X @ w)), 6)
    bins = np.minimum(
        (prob * ml.CALIB_BINS).astype(int), ml.CALIB_BINS - 1
    )
    ece = 0.0
    seen = set()
    for b in sorted(set(bins)):
        m = bins == b
        gap = abs(prob[m].mean() - y[m].mean())
        ece += gap * m.sum() / len(y)
        seen.add(b)
    assert set(rows) == seen
    for b in seen:
        m = bins == b
        r = rows[b]
        assert r.n == m.sum()
        assert abs(r.mean_prob - prob[m].mean()) < 1e-5
        assert abs(r.pos_rate - y[m].mean()) < 1e-5
        assert abs(r.calib_gap - abs(prob[m].mean() - y[m].mean())) < 2e-5
        assert abs(r.ece - ece) < 1e-4
    assert 0.0 <= list(rows.values())[0].ece <= 1.0


def test_cohens_kappa_matches_numpy_replay(spark, sf_dir):
    """Kappa must equal a numpy replay from the same unrolled weights,
    agree with m5's confusion cells, and sit in [-1, 1]."""
    import numpy as np

    from real_time_big_data_analytics_spark.operators import ml

    r = ml.cohens_kappa(spark, sf_dir).first()
    m5 = ml.logreg_gd_train(spark, sf_dir).first()
    n = m5.n_users
    po = (m5.tp + m5.tn) / n
    pe = (
        (m5.tp + m5.fp) * (m5.tp + m5.fn)
        + (m5.fn + m5.tn) * (m5.fp + m5.tn)
    ) / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert r.n_users == n
    assert abs(r.observed_agreement - po) < 1e-5
    assert abs(r.chance_agreement - pe) < 1e-5
    assert abs(r.kappa - kappa) < 1e-5
    assert -1.0 <= r.kappa <= 1.0
