"""On-device RBF-SVM inference pinned against sklearn decision_function /
predict_proba (parity target: Codes/10_test_hybrid_pipeline.py:305-316)."""

import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")

from sklearn.impute import SimpleImputer
from sklearn.pipeline import Pipeline
from sklearn.preprocessing import StandardScaler
from sklearn.svm import SVC

from shm_tpu.models.forest_jax import transform_features
from shm_tpu.models.svm_jax import (
    export_svm, svm_decision_function, svm_predict_proba,
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(400, 20)).astype(np.float32)
    y = (X[:, 0] + 0.5 * X[:, 3] + rng.normal(size=400) * 0.4 > 0).astype(int)
    Xt = rng.normal(size=(150, 20)).astype(np.float32)
    return X, y, Xt


@pytest.mark.parametrize("class_weight", [None, "balanced"])
def test_decision_function_matches_sklearn(data, class_weight):
    X, y, Xt = data
    svc = SVC(kernel="rbf", probability=True, random_state=0,
              class_weight=class_weight).fit(X, y)
    ref = svc.decision_function(Xt)
    ours = np.asarray(svm_decision_function(export_svm(svc), Xt))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_predict_proba_matches_sklearn(data):
    X, y, Xt = data
    svc = SVC(kernel="rbf", probability=True, random_state=0,
              class_weight="balanced").fit(X, y)
    ref = svc.predict_proba(Xt)[:, 1]
    ours = np.asarray(svm_predict_proba(export_svm(svc), Xt))
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_predict_proba_orientation_flipped_labels(data):
    """Same data with inverted labels — libsvm's internal ordering changes, the
    exported orientation must compensate."""
    X, y, Xt = data
    svc = SVC(kernel="rbf", probability=True, random_state=0).fit(X, 1 - y)
    ref = svc.predict_proba(Xt)[:, 1]
    ours = np.asarray(svm_predict_proba(export_svm(svc), Xt))
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_zoo_pipeline_end_to_end(data):
    """The exact svm_rbf pipeline from the zoo (imputer + scaler + SVC),
    NaN-bearing features, transform on host + score on device."""
    X, y, Xt = data
    Xn = X.copy()
    Xn[::7, 2] = np.nan
    pipe = Pipeline([
        ("imputer", SimpleImputer(strategy="median")),
        ("scaler", StandardScaler()),
        ("clf", SVC(kernel="rbf", probability=True, class_weight="balanced",
                    random_state=42)),
    ]).fit(Xn, y)
    Xt_n = Xt.copy()
    Xt_n[::5, 2] = np.nan
    ref = pipe.predict_proba(Xt_n)[:, 1]
    svm = export_svm(pipe)
    Xd = transform_features(pipe, Xt_n)
    ours = np.asarray(svm_predict_proba(svm, Xd))
    np.testing.assert_allclose(ours, ref, atol=5e-4)
    # decision parity at the reference's 0.5-style operating points: identical
    # hard routing for any threshold away from float noise
    assert np.array_equal(ours >= 0.5, ref >= 0.5)


def test_export_rejects_non_probability_svc(data):
    X, y, _ = data
    svc = SVC(kernel="rbf", probability=False).fit(X, y)
    with pytest.raises(ValueError):
        export_svm(svc)


# --- CalibratedClassifierCV(SVC(), ensemble=False): the sklearn-1.11
# replacement for SVC(probability=True) (ROADMAP item 2) ---

@pytest.mark.parametrize("method", ["sigmoid", "isotonic"])
def test_calibrated_svm_matches_sklearn(data, method):
    from sklearn.calibration import CalibratedClassifierCV

    from shm_tpu.models.svm_jax import (
        calibrated_svm_predict_proba, export_calibrated_svm,
    )

    X, y, Xt = data
    cc = CalibratedClassifierCV(
        SVC(kernel="rbf", class_weight="balanced", random_state=0),
        ensemble=False, method=method, cv=5).fit(X, y)
    ref = cc.predict_proba(Xt)[:, 1]
    ours = np.asarray(calibrated_svm_predict_proba(export_calibrated_svm(cc), Xt))
    np.testing.assert_allclose(ours, ref, atol=5e-4)
    assert np.array_equal(ours >= 0.5, ref >= 0.5)


def test_calibrated_zoo_pipeline_end_to_end(data):
    """build_ml_models(svm_probability='calibrated') end-to-end: NaN-bearing
    features, host transform + device scoring, vs the sklearn pipeline."""
    from shm_tpu.models.ml import build_ml_models
    from shm_tpu.models.svm_jax import (
        calibrated_svm_predict_proba, export_calibrated_svm,
    )

    X, y, Xt = data
    Xn = X.copy()
    Xn[::7, 2] = np.nan
    pipe = build_ml_models(seed=42, svm_probability="calibrated")["svm_rbf"]
    pipe.fit(Xn, y)
    Xt_n = Xt.copy()
    Xt_n[::5, 2] = np.nan
    ref = pipe.predict_proba(Xt_n)[:, 1]
    svm = export_calibrated_svm(pipe)
    Xd = transform_features(pipe, Xt_n)
    ours = np.asarray(calibrated_svm_predict_proba(svm, Xd))
    np.testing.assert_allclose(ours, ref, atol=5e-4)
    assert np.array_equal(ours >= 0.5, ref >= 0.5)


def test_build_ml_models_rejects_unknown_svm_probability():
    from shm_tpu.models.ml import build_ml_models

    with pytest.raises(ValueError, match="svm_probability"):
        build_ml_models(svm_probability="platt")
