"""Classical-ML baseline zoo for SF-vs-ST attribution (stage 3).

Rebuilds ``Codes/08_train_ml_baselines.py:302-341``: five sklearn models behind
median-imputer pipelines, kept on sklearn (host CPU) for exact behavioral parity
— these models train in seconds on 76-dim features and are not a TPU workload.
The featurization that feeds them IS vectorized (shm_tpu.data.features).

Includes the ``decision_function`` min-max fallback for models without
``predict_proba`` (08:233-249).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def build_ml_models(seed: int = 42,
                    svm_probability: str = "calibrated") -> Dict[str, object]:
    """``svm_probability``: "calibrated" (DEFAULT —
    ``CalibratedClassifierCV(SVC(), ensemble=False, method="sigmoid")``, the
    sklearn-1.11 replacement for the deprecated probability parameter; served
    on-device by :func:`shm_tpu.models.svm_jax.calibrated_svm_predict_proba`)
    or "svc" (the reference's exact API — ``SVC(probability=True)``,
    08:323-327 — which emits a FutureWarning on sklearn >=1.9 and is removed
    in 1.11; kept as the explicit parity flag). Quality parity of the two
    paths on the committed openLAB features is documented in MIGRATION.md."""
    from sklearn.ensemble import (
        GradientBoostingClassifier,
        HistGradientBoostingClassifier,
        RandomForestClassifier,
    )
    from sklearn.calibration import CalibratedClassifierCV
    from sklearn.impute import SimpleImputer
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import SVC
    from sklearn.tree import DecisionTreeClassifier

    if svm_probability == "svc":
        svm_clf = SVC(kernel="rbf", probability=True, class_weight="balanced",
                      random_state=seed)
    elif svm_probability == "calibrated":
        svm_clf = CalibratedClassifierCV(
            SVC(kernel="rbf", class_weight="balanced", random_state=seed),
            ensemble=False, method="sigmoid", cv=5)
    else:
        raise ValueError(f"unknown svm_probability {svm_probability!r} "
                         "(expected 'svc' or 'calibrated')")

    imputer = lambda: SimpleImputer(strategy="median")
    return {
        "cart": Pipeline([
            ("imputer", imputer()),
            ("clf", DecisionTreeClassifier(random_state=seed, class_weight="balanced")),
        ]),
        "rf": Pipeline([
            ("imputer", imputer()),
            ("clf", RandomForestClassifier(random_state=seed, n_estimators=400,
                                           class_weight="balanced_subsample",
                                           n_jobs=-1)),
        ]),
        "svm_rbf": Pipeline([
            ("imputer", imputer()),
            ("scaler", StandardScaler(with_mean=True, with_std=True)),
            ("clf", svm_clf),
        ]),
        "gb": Pipeline([
            ("imputer", imputer()),
            ("clf", GradientBoostingClassifier(random_state=seed)),
        ]),
        "hgb": HistGradientBoostingClassifier(random_state=seed, max_depth=None,
                                              learning_rate=0.05, max_iter=400),
    }


def get_prob_st(model, X: np.ndarray) -> np.ndarray:
    """p(ST) for each row; decision_function min-max fallback (08:233-249)."""
    if hasattr(model, "predict_proba"):
        return np.asarray(model.predict_proba(X))[:, 1].astype(np.float64)
    scores = np.asarray(model.decision_function(X), np.float64)
    lo, hi = scores.min(), scores.max()
    if hi - lo < 1e-12:
        return np.full_like(scores, 0.5)
    return (scores - lo) / (hi - lo)


__all__ = ["build_ml_models", "get_prob_st"]
