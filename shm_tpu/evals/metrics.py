"""Classification metrics with sklearn-compatible semantics, NumPy/JAX-native.

The reference computes every metric through scikit-learn (imports at
4DOF/Scripts/06_test_full_pipeline.py:8-24). Here the metrics are re-implemented
so the full evaluation can run on-device / dependency-light; unit tests pin each
function against sklearn on random data.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def confusion_matrix(y_true, y_pred, num_classes: int) -> np.ndarray:
    """(num_classes, num_classes) count matrix, rows = true, cols = predicted."""
    y_true = np.asarray(y_true, np.int64)
    y_pred = np.asarray(y_pred, np.int64)
    cm = np.zeros((num_classes, num_classes), np.int64)
    np.add.at(cm, (y_true, y_pred), 1)
    return cm


def accuracy(y_true, y_pred) -> float:
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    return float((y_true == y_pred).mean()) if y_true.size else 0.0


def precision_recall_fscore(
    y_true, y_pred, num_classes: int, beta: float = 1.0
) -> Dict[str, np.ndarray]:
    """Per-class precision/recall/F-beta/support + macro & weighted averages
    (zero_division=0 semantics)."""
    cm = confusion_matrix(y_true, y_pred, num_classes).astype(np.float64)
    tp = np.diag(cm)
    pred = cm.sum(axis=0)
    true = cm.sum(axis=1)
    prec = np.where(pred > 0, tp / np.where(pred > 0, pred, 1), 0.0)
    rec = np.where(true > 0, tp / np.where(true > 0, true, 1), 0.0)
    b2 = beta * beta
    denom = b2 * prec + rec
    f = np.where(denom > 0, (1 + b2) * prec * rec / np.where(denom > 0, denom, 1), 0.0)
    support = true
    total = max(support.sum(), 1.0)
    return {
        "precision": prec,
        "recall": rec,
        "fscore": f,
        "support": support.astype(np.int64),
        "macro": np.array([prec.mean(), rec.mean(), f.mean()]),
        "weighted": np.array([
            (prec * support).sum() / total,
            (rec * support).sum() / total,
            (f * support).sum() / total,
        ]),
    }


def binary_prf(y_true, y_pred) -> Dict[str, float]:
    """Binary precision/recall/F1 for the positive class (label 1)."""
    r = precision_recall_fscore(y_true, y_pred, 2)
    return {
        "precision": float(r["precision"][1]),
        "recall": float(r["recall"][1]),
        "f1": float(r["fscore"][1]),
    }


def _binary_clf_curve(y_true, score) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(fps, tps, thresholds) at distinct score cut points, descending score."""
    y_true = np.asarray(y_true).astype(np.int64)
    score = np.asarray(score, np.float64)
    order = np.argsort(-score, kind="stable")
    score = score[order]
    y_true = y_true[order]
    distinct = np.where(np.diff(score))[0]
    idx = np.r_[distinct, y_true.size - 1]
    tps = np.cumsum(y_true)[idx].astype(np.float64)
    fps = (idx + 1) - tps
    return fps, tps, score[idx]


def roc_curve(y_true, score) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(fpr, tpr, thresholds) — sklearn semantics incl. the (0,0) anchor point
    with threshold inf, and collinear-point dropping omitted (harmless for AUC)."""
    fps, tps, thr = _binary_clf_curve(y_true, score)
    tps = np.r_[0.0, tps]
    fps = np.r_[0.0, fps]
    thr = np.r_[np.inf, thr]
    fpr = fps / fps[-1] if fps[-1] > 0 else np.zeros_like(fps)
    tpr = tps / tps[-1] if tps[-1] > 0 else np.zeros_like(tps)
    return fpr, tpr, thr


def auc(x, y) -> float:
    """Trapezoidal area under a curve given ascending x."""
    x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
    return float(np.trapezoid(y, x))


def roc_auc_score(y_true, score) -> float:
    fpr, tpr, _ = roc_curve(y_true, score)
    return auc(fpr, tpr)


def precision_recall_curve(y_true, score) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(precision, recall, thresholds) — sklearn semantics: ascending-threshold
    orientation with the final (1, 0) anchor."""
    fps, tps, thr = _binary_clf_curve(y_true, score)
    denom = tps + fps
    prec = np.where(denom > 0, tps / np.where(denom > 0, denom, 1), 0.0)
    rec = tps / tps[-1] if tps[-1] > 0 else np.zeros_like(tps)
    # reverse to ascending threshold, append anchor
    prec = np.r_[prec[::-1], 1.0]
    rec = np.r_[rec[::-1], 0.0]
    return prec, rec, thr[::-1]


def average_precision_score(y_true, score) -> float:
    """AP = sum_n (R_n - R_{n-1}) P_n (sklearn step-interpolation)."""
    prec, rec, _ = precision_recall_curve(y_true, score)
    # rec descends from 1->0 in our orientation (ascending thresholds)
    return float(-np.sum(np.diff(rec) * prec[:-1]))


def classification_report_dict(y_true, y_pred, labels) -> Dict[str, Dict[str, float]]:
    """Dict-shaped classification report (per-label P/R/F1/support + accuracy +
    macro/weighted averages), mirroring sklearn's ``classification_report``."""
    n = len(labels)
    r = precision_recall_fscore(y_true, y_pred, n)
    out: Dict[str, Dict[str, float]] = {}
    for i, name in enumerate(labels):
        out[str(name)] = {
            "precision": float(r["precision"][i]),
            "recall": float(r["recall"][i]),
            "f1-score": float(r["fscore"][i]),
            "support": int(r["support"][i]),
        }
    total = int(r["support"].sum())
    out["accuracy"] = {"accuracy": accuracy(y_true, y_pred), "support": total}
    for avg, vals in (("macro avg", r["macro"]), ("weighted avg", r["weighted"])):
        out[avg] = {
            "precision": float(vals[0]),
            "recall": float(vals[1]),
            "f1-score": float(vals[2]),
            "support": total,
        }
    return out


__all__ = [
    "confusion_matrix",
    "accuracy",
    "precision_recall_fscore",
    "binary_prf",
    "roc_curve",
    "auc",
    "roc_auc_score",
    "precision_recall_curve",
    "average_precision_score",
    "classification_report_dict",
]
