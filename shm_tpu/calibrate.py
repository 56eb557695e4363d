"""Threshold calibration: percentile gates and ST-first decision-threshold tuning.

Parity targets:
- gate threshold = percentile of healthy-window MSE scores
  (4DOF/Scripts/04_vae_thresholding.py:283 — p99 of normal-val scores;
  Codes/05_validate_vae.py:37,253 — p95 of VAL-normal scores)
- score summaries (04_vae_thresholding.py:127-140)
- ST-first threshold tuning over a fixed 99-point grid
  (Codes/06_train_cnn.py:239-324, also 07_validate_cnn.py:149-229 and
  08_train_ml_baselines.py:145-230), vectorized over the whole grid at once.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def percentile_threshold(scores, q: float) -> float:
    """q-th percentile with NumPy's default linear interpolation (matches the
    reference's ``np.percentile(scores, 99)``).

    Dtype sensitivity (pinned by tests/test_calibrate_dtype.py): on TPU the
    scores come from the bf16 fused gate kernel (``reconstruction_mse``
    ``fused="auto"``). Measured on the committed trained artifacts, the
    resulting threshold differs from forced XLA-f32 scoring by <1e-3 relative
    for the 4DOF p99 and ~2.1e-3 relative for the openLAB P95 (H=64, T=200:
    longer bf16-product accumulation over clip(+-10)-standardized inputs).
    Gate decisions on the trained artifacts agree 100% either way
    (BENCHMARKS.md).
    """
    return float(np.percentile(np.asarray(scores), q))


def summarize_scores(scores) -> Dict[str, float]:
    s = np.asarray(scores)
    if s.size == 0:
        return {}
    return {
        "n": float(s.size),
        "mean": float(np.mean(s)),
        "std": float(np.std(s)),
        "p50": float(np.percentile(s, 50)),
        "p90": float(np.percentile(s, 90)),
        "p95": float(np.percentile(s, 95)),
        "p99": float(np.percentile(s, 99)),
        "max": float(np.max(s)),
        "min": float(np.min(s)),
    }


def _fbeta(prec: np.ndarray, rec: np.ndarray, beta: float) -> np.ndarray:
    b2 = beta * beta
    denom = b2 * prec + rec
    return np.where(denom > 0, (1 + b2) * prec * rec / np.where(denom > 0, denom, 1.0), 0.0)


def tune_threshold_st_first(
    p_st: np.ndarray,
    y_true: np.ndarray,
    *,
    p_min_st: float = 0.25,
    min_prec_sf: float = 0.0,
    beta_for_f2_st: float = 2.0,
    grid_points: int = 99,
    grid_lo: float = 0.01,
    grid_hi: float = 0.99,
) -> Dict:
    """ST-first decision threshold: predict ST (1) if p(ST) >= t else SF (0).

    Selection order (Codes/06_train_cnn.py:239-324):
      1) prefer thresholds with ST precision >= p_min_st (and SF precision floor
         if set); 2) maximize ST recall; 3) tie-break ST-F_beta; 4) tie-break
         macro-F1; ties resolve to the smallest t (the reference replaces only on
         strict improvement while scanning t ascending). If no threshold meets the
         floor, fall back to the best ST-F_beta overall.

    Vectorized: the entire (grid x N) prediction matrix is evaluated in one shot.
    """
    p_st = np.asarray(p_st, np.float64)
    y = np.asarray(y_true, np.int64)
    ts = np.linspace(grid_lo, grid_hi, grid_points)

    yhat = (p_st[None, :] >= ts[:, None]).astype(np.int64)   # (G, N)
    pos = y == 1
    neg = y == 0

    tp_st = (yhat & pos[None, :]).sum(axis=1).astype(np.float64)
    pred_st = yhat.sum(axis=1).astype(np.float64)
    n_st = float(pos.sum())
    tp_sf = ((1 - yhat) & neg[None, :]).sum(axis=1).astype(np.float64)
    pred_sf = (1 - yhat).sum(axis=1).astype(np.float64)
    n_sf = float(neg.sum())

    prec_st = np.where(pred_st > 0, tp_st / np.where(pred_st > 0, pred_st, 1), 0.0)
    rec_st = tp_st / n_st if n_st > 0 else np.zeros_like(tp_st)
    prec_sf = np.where(pred_sf > 0, tp_sf / np.where(pred_sf > 0, pred_sf, 1), 0.0)
    rec_sf = tp_sf / n_sf if n_sf > 0 else np.zeros_like(tp_sf)

    f2_st = _fbeta(prec_st, rec_st, beta_for_f2_st)
    f1_st = _fbeta(prec_st, rec_st, 1.0)
    f1_sf = _fbeta(prec_sf, rec_sf, 1.0)
    macro_f1 = 0.5 * (f1_st + f1_sf)

    meets_st = prec_st >= p_min_st
    meets_sf = (prec_sf >= min_prec_sf) if min_prec_sf > 0 else np.ones_like(meets_st)
    ok = meets_st & meets_sf

    def lex_best(mask: np.ndarray) -> int:
        # lexicographic argmax of (rec_st, f2_st, macro_f1), smallest t on full tie
        cand = np.where(mask)[0]
        order = np.lexsort((cand, -macro_f1[cand], -f2_st[cand], -rec_st[cand]))
        return int(cand[order[0]])

    used_fallback = not bool(ok.any())
    if used_fallback:
        # strict-> scan means first (smallest t) among argmax f2_st
        i = int(np.argmax(f2_st))
    else:
        i = lex_best(ok)

    return {
        "t": float(ts[i]),
        "prec_sf": float(prec_sf[i]),
        "rec_sf": float(rec_sf[i]),
        "prec_st": float(prec_st[i]),
        "rec_st": float(rec_st[i]),
        "f2_st": float(f2_st[i]),
        "macro_f1": float(macro_f1[i]),
        "meets_prec_st": bool(meets_st[i]),
        "meets_prec_sf": bool(meets_sf[i]) if min_prec_sf > 0 else True,
        "meets_constraints": bool(ok[i]),
        "used_fallback": used_fallback,
    }


__all__ = ["percentile_threshold", "summarize_scores", "tune_threshold_st_first"]
