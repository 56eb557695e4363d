"""Metrics pinned against scikit-learn on random data."""

import numpy as np
import pytest

sklearn_metrics = pytest.importorskip("sklearn.metrics")

from shm_tpu.evals import (
    confusion_matrix, accuracy, precision_recall_fscore, roc_auc_score,
    average_precision_score, roc_curve, precision_recall_curve, binary_prf,
)
from shm_tpu.calibrate import (
    percentile_threshold, summarize_scores, tune_threshold_st_first,
)


@pytest.fixture
def data(rng):
    y = rng.integers(0, 3, 500)
    yhat = np.where(rng.random(500) < 0.7, y, rng.integers(0, 3, 500))
    return y, yhat


def test_confusion_matrix(data):
    y, yhat = data
    np.testing.assert_array_equal(
        confusion_matrix(y, yhat, 3),
        sklearn_metrics.confusion_matrix(y, yhat, labels=[0, 1, 2]))


def test_accuracy(data):
    y, yhat = data
    assert accuracy(y, yhat) == pytest.approx(sklearn_metrics.accuracy_score(y, yhat))


def test_prf(data):
    y, yhat = data
    r = precision_recall_fscore(y, yhat, 3)
    p, rec, f, sup = sklearn_metrics.precision_recall_fscore_support(
        y, yhat, labels=[0, 1, 2], zero_division=0)
    np.testing.assert_allclose(r["precision"], p, atol=1e-12)
    np.testing.assert_allclose(r["recall"], rec, atol=1e-12)
    np.testing.assert_allclose(r["fscore"], f, atol=1e-12)
    np.testing.assert_array_equal(r["support"], sup)
    mp, mr, mf, _ = sklearn_metrics.precision_recall_fscore_support(
        y, yhat, labels=[0, 1, 2], average="macro", zero_division=0)
    np.testing.assert_allclose(r["macro"], [mp, mr, mf], atol=1e-12)
    wp, wr, wf, _ = sklearn_metrics.precision_recall_fscore_support(
        y, yhat, labels=[0, 1, 2], average="weighted", zero_division=0)
    np.testing.assert_allclose(r["weighted"], [wp, wr, wf], atol=1e-12)


def test_binary_prf(rng):
    y = rng.integers(0, 2, 300)
    yhat = rng.integers(0, 2, 300)
    r = binary_prf(y, yhat)
    assert r["precision"] == pytest.approx(
        sklearn_metrics.precision_score(y, yhat, zero_division=0))
    assert r["recall"] == pytest.approx(sklearn_metrics.recall_score(y, yhat))
    assert r["f1"] == pytest.approx(sklearn_metrics.f1_score(y, yhat))


def test_roc_and_pr(rng):
    y = rng.integers(0, 2, 400)
    s = rng.random(400) * 0.5 + y * rng.random(400) * 0.5
    assert roc_auc_score(y, s) == pytest.approx(
        sklearn_metrics.roc_auc_score(y, s), abs=1e-10)
    assert average_precision_score(y, s) == pytest.approx(
        sklearn_metrics.average_precision_score(y, s), abs=1e-10)
    # curves integrate to the same AUCs even if point sets differ
    fpr, tpr, _ = roc_curve(y, s)
    assert np.trapezoid(tpr, fpr) == pytest.approx(
        sklearn_metrics.roc_auc_score(y, s), abs=1e-10)


def test_percentile_threshold_matches_numpy(rng):
    s = rng.random(2010).astype(np.float32)
    assert percentile_threshold(s, 99) == pytest.approx(float(np.percentile(s, 99)))
    summ = summarize_scores(s)
    assert summ["n"] == 2010
    assert summ["p95"] == pytest.approx(float(np.percentile(s, 95)))


def ref_tune_st_first(p_st, y_true, p_min_st=0.25, beta=2.0):
    """Sequential port of Codes/06_train_cnn.py:239-324 for cross-checking."""
    from sklearn.metrics import f1_score as sk_f1

    def prec_rec(y, yhat, cls):
        m = yhat == cls
        prec = (y[m] == cls).mean() if m.any() else 0.0
        mt = y == cls
        rec = (yhat[mt] == cls).mean() if mt.any() else 0.0
        return prec, rec

    def fbeta(p, r, b):
        d = b * b * p + r
        return (1 + b * b) * p * r / d if d > 0 else 0.0

    ts = np.linspace(0.01, 0.99, 99)
    best = None
    fallback = None
    for t in ts:
        yhat = (p_st >= t).astype(int)
        psf, rsf = prec_rec(y_true, yhat, 0)
        pst, rst = prec_rec(y_true, yhat, 1)
        f2 = fbeta(pst, rst, beta)
        mf1 = sk_f1(y_true, yhat, average="macro", zero_division=0)
        cand = dict(t=float(t), rec_st=rst, f2_st=f2, macro_f1=mf1,
                    ok=pst >= p_min_st)
        if fallback is None or cand["f2_st"] > fallback["f2_st"]:
            fallback = cand
        if best is None:
            best = cand
            continue
        if cand["ok"] and not best["ok"]:
            best = cand
            continue
        if cand["ok"] == best["ok"]:
            if cand["rec_st"] > best["rec_st"]:
                best = cand
            elif cand["rec_st"] == best["rec_st"] and cand["f2_st"] > best["f2_st"]:
                best = cand
            elif (cand["rec_st"] == best["rec_st"] and cand["f2_st"] == best["f2_st"]
                  and cand["macro_f1"] > best["macro_f1"]):
                best = cand
    if not best["ok"]:
        return fallback["t"], True
    return best["t"], False


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_tune_threshold_st_first_matches_sequential_reference(seed):
    rng = np.random.default_rng(seed)
    n = 300
    y = (rng.random(n) < 0.3).astype(int)
    p = np.clip(0.3 * y + rng.random(n) * 0.7, 0, 1)
    ours = tune_threshold_st_first(p, y)
    t_ref, fb_ref = ref_tune_st_first(p, y)
    assert ours["t"] == pytest.approx(t_ref)
    assert ours["used_fallback"] == fb_ref


def test_tune_threshold_fallback_when_unreachable():
    # ST precision can never reach 0.25: scores anti-correlated with labels
    y = np.array([0] * 95 + [1] * 5)
    p = np.concatenate([np.linspace(0.5, 0.99, 95), np.full(5, 0.01)])
    out = tune_threshold_st_first(p, y)
    t_ref, fb_ref = ref_tune_st_first(p, y)
    assert out["used_fallback"] == fb_ref
    assert out["t"] == pytest.approx(t_ref)


def test_classification_report_dict_matches_sklearn(data):
    from shm_tpu.evals import classification_report_dict
    y, yhat = data
    ours = classification_report_dict(y, yhat, ["A", "B", "C"])
    ref = sklearn_metrics.classification_report(
        y, yhat, target_names=["A", "B", "C"], output_dict=True, zero_division=0)
    for cls in ("A", "B", "C", "macro avg", "weighted avg"):
        for k in ("precision", "recall", "f1-score", "support"):
            assert ours[cls][k] == pytest.approx(ref[cls][k]), (cls, k)
    assert ours["accuracy"]["accuracy"] == pytest.approx(ref["accuracy"])
