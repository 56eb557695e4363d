"""On-device tree-ensemble inference pinned against sklearn predict_proba."""

import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")

from sklearn.ensemble import (
    GradientBoostingClassifier,
    HistGradientBoostingClassifier,
    RandomForestClassifier,
)
from sklearn.impute import SimpleImputer
from sklearn.pipeline import Pipeline
from sklearn.tree import DecisionTreeClassifier

from shm_tpu.models.forest_jax import (
    ensemble_predict_proba, export_ensemble, transform_features,
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(400, 20)).astype(np.float32)
    y = (X[:, 0] + 0.5 * X[:, 3] + rng.normal(size=400) * 0.4 > 0).astype(int)
    Xt = rng.normal(size=(150, 20)).astype(np.float32)
    return X, y, Xt


@pytest.mark.parametrize("factory", [
    lambda: DecisionTreeClassifier(random_state=0, class_weight="balanced"),
    lambda: RandomForestClassifier(random_state=0, n_estimators=40),
    lambda: GradientBoostingClassifier(random_state=0, n_estimators=60),
    lambda: HistGradientBoostingClassifier(random_state=0, max_iter=40,
                                           learning_rate=0.05),
])
def test_matches_sklearn(factory, data):
    X, y, Xt = data
    mdl = factory().fit(X, y)
    ref = mdl.predict_proba(Xt)[:, 1]
    ours = np.asarray(ensemble_predict_proba(export_ensemble(mdl), Xt))
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_pipeline_with_imputer(data):
    X, y, Xt = data
    Xn = X.copy()
    Xn[::7, 2] = np.nan
    pipe = Pipeline([("imputer", SimpleImputer(strategy="median")),
                     ("clf", RandomForestClassifier(random_state=0,
                                                    n_estimators=20))])
    pipe.fit(Xn, y)
    Xt_n = Xt.copy()
    Xt_n[::5, 2] = np.nan
    ref = pipe.predict_proba(Xt_n)[:, 1]
    ens = export_ensemble(pipe)
    Xd = transform_features(pipe, Xt_n)
    ours = np.asarray(ensemble_predict_proba(ens, Xd))
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_hgb_nan_routing_matches_sklearn():
    """HGB is served WITHOUT an imputer (native NaN handling) — the device
    path must honor the per-node missing_go_to_left direction instead of
    sending every NaN right."""
    from sklearn.ensemble import HistGradientBoostingClassifier

    from shm_tpu.models.forest_jax import (
        ensemble_predict_proba, export_ensemble,
    )

    rng = np.random.default_rng(3)
    X = rng.normal(size=(400, 8)).astype(np.float64)
    X[rng.random(X.shape) < 0.15] = np.nan          # NaNs in TRAIN too
    y = (np.nan_to_num(X[:, 0]) + 0.5 * np.nan_to_num(X[:, 2]) > 0).astype(int)
    model = HistGradientBoostingClassifier(random_state=0, max_iter=50,
                                           learning_rate=0.1).fit(X, y)

    Xt = rng.normal(size=(200, 8)).astype(np.float64)
    Xt[rng.random(Xt.shape) < 0.25] = np.nan        # heavy NaN at serve time
    ref = model.predict_proba(Xt)[:, 1]
    ours = np.asarray(ensemble_predict_proba(export_ensemble(model),
                                             Xt.astype(np.float32)))
    np.testing.assert_allclose(ours, ref, atol=5e-5)
