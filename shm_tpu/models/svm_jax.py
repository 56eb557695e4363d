"""On-device (XLA/MXU) inference for a fitted sklearn RBF-kernel SVC.

The reference serves its SVM baseline through sklearn's host-side
``predict_proba`` (Codes/10_test_hybrid_pipeline.py:305-316). A fitted binary
SVC is just data — support vectors, dual coefficients, an intercept, and the
two libsvm Platt constants — so inference maps cleanly onto the TPU:

- the kernel matrix ``K[i, j] = exp(-gamma * ||x_i - sv_j||^2)`` is computed
  via the expansion ``||x||^2 + ||sv||^2 - 2 x @ sv.T`` — one (N, F) x (F, S)
  matmul on the MXU plus elementwise work XLA fuses into it;
- ``decision_function = K @ dual_coef + intercept`` (a second matmul);
- ``predict_proba`` replicates libsvm's binary probability pipeline EXACTLY
  (pinned to 64-bit-noise level in tests/test_svm_jax.py): the Platt sigmoid
  ``1 / (1 + exp(A * f + B))`` on the *internal* decision value, the
  [1e-7, 1-1e-7] clamp, and — the subtle part — libsvm's
  ``multiclass_probability`` Gauss-Seidel coupling, which even for k=2 stops
  at ``eps = 0.0025`` instead of the analytic fixed point, leaving O(3e-3)
  deviations a plain sigmoid cannot reproduce. libsvm orients its internal
  decision value toward its first *internal* label (sklearn's public
  ``decision_function`` may be the negation), so export resolves the
  orientation once by comparing both candidates against sklearn's own
  ``predict_proba`` on a handful of support vectors.

Distances/decisions run in f32 (margin-safe at these feature scales; the
decision test pins 1e-4 agreement); the probability coupling runs in the
sample dimension only — elementwise, 100 masked Gauss-Seidel steps, fused by
XLA into negligible work next to the kernel matmul.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


_MIN_PROB = 1e-7          # libsvm svm.cpp: min_prob in svm_predict_probability
_COUPLING_EPS = 0.005 / 2  # libsvm multiclass_probability: eps = 0.005 / k
_COUPLING_ITERS = 100      # libsvm: max_iter = max(100, k)


class RBFSVM(NamedTuple):
    sv: jax.Array          # (S, F) support vectors (post-pipeline features)
    dual_coef: jax.Array   # (S,) y_i * alpha_i
    intercept: float
    gamma: float
    prob_a: float          # libsvm Platt slope (probA_)
    prob_b: float          # libsvm Platt offset (probB_)
    first_is_cls1: bool    # libsvm's first internal label == sklearn classes_[1]


def _sigmoid_predict(dec, a, b):
    """libsvm sigmoid_predict: stable ``1 / (1 + exp(a * dec + b))``."""
    return jax.nn.sigmoid(-(a * dec + b))


def _coupling_k2(r01: jax.Array) -> tuple[jax.Array, jax.Array]:
    """libsvm ``multiclass_probability`` for k=2, vectorized over samples.

    Gauss-Seidel minimization of p^T Q p over the simplex, with libsvm's exact
    update order (t=0 then t=1 per iteration), per-sample early-stop semantics
    (a converged sample freezes while others continue — realized as masked
    updates over a fixed iteration count), and stopping test
    ``max_t |.(Qp)_t - p^T Q p| < eps`` evaluated BEFORE each sweep.
    """
    r10 = 1.0 - r01
    q00, q01, q11 = r10 * r10, -r10 * r01, r01 * r01
    n = r01.shape[0]
    p0 = jnp.full((n,), 0.5, r01.dtype)
    p1 = jnp.full((n,), 0.5, r01.dtype)
    done = jnp.zeros((n,), bool)

    def body(_, st):
        p0, p1, done = st
        qp0 = q00 * p0 + q01 * p1
        qp1 = q01 * p0 + q11 * p1
        pqp = p0 * qp0 + p1 * qp1
        err = jnp.maximum(jnp.abs(qp0 - pqp), jnp.abs(qp1 - pqp))
        done = done | (err < _COUPLING_EPS)
        act = ~done
        # t = 0
        d = jnp.where(act, (-qp0 + pqp) / q00, 0.0)
        p0n = p0 + d
        pqp = (pqp + d * (d * q00 + 2 * qp0)) / (1 + d) ** 2
        qp0 = (qp0 + d * q00) / (1 + d)
        qp1 = (qp1 + d * q01) / (1 + d)
        p0, p1 = p0n / (1 + d), p1 / (1 + d)
        # t = 1
        d = jnp.where(act, (-qp1 + pqp) / q11, 0.0)
        p1n = p1 + d
        qp0 = (qp0 + d * q01) / (1 + d)
        p0, p1 = p0 / (1 + d), p1n / (1 + d)
        return p0, p1, done

    p0, p1, _ = jax.lax.fori_loop(0, _COUPLING_ITERS, body, (p0, p1, done))
    return p0, p1


def _proba_from_decision(f, a, b, first_is_cls1: bool):
    f_int = f if first_is_cls1 else -f
    r01 = jnp.clip(_sigmoid_predict(f_int, a, b), _MIN_PROB, 1.0 - _MIN_PROB)
    p0, p1 = _coupling_k2(r01)
    return p0 if first_is_cls1 else p1


def export_svm(model) -> RBFSVM:
    """Convert a fitted binary ``SVC(kernel="rbf", probability=True)`` (or a
    Pipeline ending in one) into device arrays.

    The pipeline's imputer/scaler must be applied to inputs beforehand with
    :func:`shm_tpu.models.forest_jax.transform_features` — the exported support
    vectors already live in that transformed space (sklearn stores them
    post-pipeline).
    """
    from sklearn.pipeline import Pipeline
    from sklearn.svm import SVC

    svc = model.steps[-1][1] if isinstance(model, Pipeline) else model
    if not isinstance(svc, SVC) or svc.kernel != "rbf":
        raise TypeError(f"expected a fitted rbf SVC, got {type(svc)}")
    if len(svc.classes_) != 2:
        raise NotImplementedError("binary SVC only")
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", FutureWarning)  # probA_/probB_ deprecation
        if not hasattr(svc, "probA_") or np.asarray(svc.probA_).size == 0:
            raise ValueError("SVC was not fitted with probability=True")
        prob_a = float(np.asarray(svc.probA_)[0])
        prob_b = float(np.asarray(svc.probB_)[0])

    sv = np.asarray(svc.support_vectors_, np.float32)
    dual = np.asarray(svc.dual_coef_, np.float32).ravel()
    b = float(svc.intercept_[0])
    gamma = float(svc._gamma)

    # Resolve libsvm's internal label orientation empirically: run the full
    # probability pipeline (f64, host) for both orientations on a few support
    # vectors and keep the one matching sklearn's predict_proba. Support
    # vectors are post-pipeline features, so the bare SVC scores them directly.
    probe = sv[: min(16, sv.shape[0])].astype(np.float64)
    f = np.asarray(svc.decision_function(probe), np.float64)
    ref = svc.predict_proba(probe)[:, 1]
    errs = []
    for cand in (True, False):
        p = np.asarray(_proba_from_decision(jnp.asarray(f), prob_a, prob_b, cand))
        errs.append(np.abs(p - ref).max())
    first_is_cls1 = bool(errs[0] <= errs[1])

    return RBFSVM(
        sv=jnp.asarray(sv), dual_coef=jnp.asarray(dual), intercept=b,
        gamma=gamma, prob_a=prob_a, prob_b=prob_b, first_is_cls1=first_is_cls1,
    )


def _rbf_decision(sv, dual_coef, intercept, gamma, X):
    X = jnp.asarray(X, jnp.float32)
    x2 = (X ** 2).sum(axis=1, keepdims=True)          # (N, 1)
    s2 = (sv ** 2).sum(axis=1)[None, :]               # (1, S)
    d2 = jnp.maximum(x2 + s2 - 2.0 * X @ sv.T, 0.0)
    K = jnp.exp(-gamma * d2)                           # (N, S)
    return K @ dual_coef + intercept


def svm_decision_function(svm: RBFSVM, X: jax.Array) -> jax.Array:
    """sklearn-equivalent ``decision_function`` for each row of X (N, F)."""
    return _rbf_decision(svm.sv, svm.dual_coef, svm.intercept, svm.gamma, X)


def svm_predict_proba(svm: RBFSVM, X: jax.Array) -> jax.Array:
    """p(classes_[1]) per row, matching sklearn's binary ``predict_proba``
    bit-for-bit in exact arithmetic (f32 kernel noise ~1e-5 in practice)."""
    f = svm_decision_function(svm, X)
    return _proba_from_decision(f, svm.prob_a, svm.prob_b, svm.first_is_cls1)


class CalibratedRBFSVM(NamedTuple):
    """The post-``SVC(probability=True)`` serving path (sklearn deprecates it
    for removal in 1.11; the replacement is
    ``CalibratedClassifierCV(SVC(), ensemble=False)`` — ROADMAP item 2).

    With ``ensemble=False`` the fitted object is one base SVC (refit on the
    full train set) plus ONE calibrator mapping its public decision_function
    to p(classes_[1]): sigmoid ``expit(-(a f + b))`` or isotonic
    (piecewise-linear interp over the fitted thresholds, clipped at the
    ends — exactly ``jnp.interp``). No libsvm coupling involved.
    ``method`` is a static Python str: branch at trace time, closure-capture
    under jit (same usage pattern as :class:`RBFSVM`).
    """

    sv: jax.Array          # (S, F) support vectors of the base SVC
    dual_coef: jax.Array   # (S,)
    intercept: float
    gamma: float
    method: str            # "sigmoid" | "isotonic"
    a: float               # sigmoid slope (0.0 for isotonic)
    b: float               # sigmoid offset (0.0 for isotonic)
    iso_x: jax.Array       # isotonic X_thresholds_ (size 0 for sigmoid)
    iso_y: jax.Array       # isotonic y_thresholds_ (size 0 for sigmoid)


def export_calibrated_svm(model) -> CalibratedRBFSVM:
    """Convert a fitted binary ``CalibratedClassifierCV(SVC(kernel="rbf"),
    ensemble=False)`` (or a Pipeline ending in one) into device arrays.

    As with :func:`export_svm`, pipeline preprocessing must be applied to
    inputs beforehand (``transform_features``) — support vectors are stored
    post-pipeline.
    """
    from sklearn.calibration import CalibratedClassifierCV
    from sklearn.pipeline import Pipeline
    from sklearn.svm import SVC

    cc = model.steps[-1][1] if isinstance(model, Pipeline) else model
    if not isinstance(cc, CalibratedClassifierCV):
        raise TypeError(f"expected a fitted CalibratedClassifierCV, got {type(cc)}")
    inner = cc.calibrated_classifiers_
    if len(inner) != 1:
        raise NotImplementedError(
            f"ensemble=False expected (one calibrated classifier, got {len(inner)})")
    c0 = inner[0]
    svc = c0.estimator
    if not isinstance(svc, SVC) or svc.kernel != "rbf":
        raise TypeError(f"expected an rbf SVC base estimator, got {type(svc)}")
    if len(cc.classes_) != 2:
        raise NotImplementedError("binary only")

    cal = c0.calibrators[0]
    if hasattr(cal, "a_"):                       # _SigmoidCalibration
        method, a, b = "sigmoid", float(cal.a_), float(cal.b_)
        iso_x = jnp.zeros((0,), jnp.float32)
        iso_y = jnp.zeros((0,), jnp.float32)
    elif hasattr(cal, "X_thresholds_"):          # IsotonicRegression
        method, a, b = "isotonic", 0.0, 0.0
        iso_x = jnp.asarray(np.asarray(cal.X_thresholds_, np.float32))
        iso_y = jnp.asarray(np.asarray(cal.y_thresholds_, np.float32))
    else:
        raise TypeError(f"unrecognized calibrator {type(cal)}")

    return CalibratedRBFSVM(
        sv=jnp.asarray(np.asarray(svc.support_vectors_, np.float32)),
        dual_coef=jnp.asarray(np.asarray(svc.dual_coef_, np.float32).ravel()),
        intercept=float(svc.intercept_[0]), gamma=float(svc._gamma),
        method=method, a=a, b=b, iso_x=iso_x, iso_y=iso_y,
    )


def calibrated_svm_predict_proba(svm: CalibratedRBFSVM, X: jax.Array) -> jax.Array:
    """p(classes_[1]) per row, matching the CalibratedClassifierCV pipeline."""
    f = _rbf_decision(svm.sv, svm.dual_coef, svm.intercept, svm.gamma, X)
    if svm.method == "sigmoid":
        return jax.nn.sigmoid(-(svm.a * f + svm.b))
    return jnp.interp(f, svm.iso_x, svm.iso_y)


__all__ = [
    "RBFSVM", "export_svm", "svm_decision_function", "svm_predict_proba",
    "CalibratedRBFSVM", "export_calibrated_svm", "calibrated_svm_predict_proba",
]
