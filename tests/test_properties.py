"""Property-based tests (hypothesis) for the core windowing/calibration math.

The golden tests pin these functions against the reference's committed
artifacts at the production shapes; these properties fuzz the SHAPE and
VALUE space instead — ragged final segments, tiny series, arbitrary
strides, contaminated inputs — where a silent off-by-one would not show up
in any fixed-shape test. Reference semantics being fuzzed:

- make_windows / stitch_windows / segment_rmse: 1_DOF/Scripts/datasets.py:6-71
- normalize_windows nan_to_num: 4DOF/Scripts/03_train_vae.py:115-117
- percentile gate (strict >): 4DOF/Scripts/04_vae_thresholding.py:283 +
  06_test_full_pipeline.py:350

Examples are kept small (CPU; every distinct shape is a fresh XLA compile)
and deadlines disabled (first-call compile latency would trip them).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from shm_tpu.calibrate import percentile_threshold
from shm_tpu.data.windows import (
    make_windows,
    normalize_windows,
    num_windows,
    segment_rmse,
    stitch_windows,
)

SETTINGS = dict(deadline=None, max_examples=25)


def _series(seed: int, T: int, F: int) -> np.ndarray:
    return np.random.default_rng(seed).normal(size=(T, F)).astype(np.float32)


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), T=st.integers(1, 40),
       L=st.integers(1, 40), stride=st.integers(1, 7), F=st.integers(1, 4))
def test_make_windows_matches_reference_loop(seed, T, L, stride, F):
    """One-gather windowing == the reference's np.stack list comprehension
    (1_DOF/Scripts/datasets.py:25-35), including the too-short-series case."""
    x = _series(seed, T, F)
    got = np.asarray(make_windows(x, L, stride))
    ref = (np.stack([x[i:i + L] for i in range(0, T - L + 1, stride)])
           if T >= L else np.zeros((0, L, F), np.float32))
    assert got.shape[0] == num_windows(T, L, stride) == ref.shape[0]
    np.testing.assert_array_equal(got, ref)


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), T=st.integers(2, 40),
       L=st.integers(1, 40), stride=st.integers(1, 7), F=st.integers(1, 3))
def test_stitch_windows_matches_reference_loop(seed, T, L, stride, F):
    """Scatter-add stitching == the reference's per-window accumulation loop
    (1_DOF/Scripts/datasets.py:38-54); positions no window covers stay 0."""
    L = min(L, T)
    x = _series(seed, T, F)
    W = np.asarray(make_windows(x, L, stride))
    got = np.asarray(stitch_windows(W, T, stride))

    acc = np.zeros((T, F), np.float64)
    cnt = np.zeros((T,), np.float64)
    for k in range(W.shape[0]):
        s = k * stride
        acc[s:s + L] += W[k]
        cnt[s:s + L] += 1.0
    ref = acc / np.where(cnt == 0, 1.0, cnt)[:, None]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), T=st.integers(1, 50),
       L=st.integers(1, 50), F=st.integers(1, 3))
def test_stride1_stitch_roundtrip(seed, T, L, F):
    """Every position is covered only by copies of itself at stride 1, so
    windowing then stitching is the identity."""
    L = min(L, T)
    x = _series(seed, T, F)
    back = np.asarray(stitch_windows(make_windows(x, L, 1), T, 1))
    np.testing.assert_allclose(back, x, rtol=1e-5, atol=1e-6)


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), T=st.integers(1, 60),
       S=st.integers(1, 20), F=st.integers(1, 3))
def test_segment_rmse_matches_reference_loop(seed, T, S, F):
    """Padded-segment RMSE == the reference's python loop including the
    short final segment (1_DOF/Scripts/datasets.py:57-71)."""
    rng = np.random.default_rng(seed)
    y = rng.normal(size=(T, F)).astype(np.float32)
    p = rng.normal(size=(T, F)).astype(np.float32)
    got = np.asarray(segment_rmse(y, p, S))
    ref = [np.sqrt(np.mean((p[s:s + S] - y[s:s + S]) ** 2))
           for s in range(0, T, S)]
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-6)


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), n_bad=st.integers(0, 20))
def test_normalize_windows_scrubs_nonfinite(seed, n_bad):
    """nan_to_num parity (4DOF/Scripts/03_train_vae.py:115-117): any NaN/Inf
    contamination (in the data OR zero-std features) leaves finite output."""
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(4, 10, 3)).astype(np.float32)
    flat = W.reshape(-1)
    idx = rng.choice(flat.size, size=min(n_bad, flat.size), replace=False)
    flat[idx] = rng.choice([np.nan, np.inf, -np.inf], size=idx.size)
    mean = rng.normal(size=(3,)).astype(np.float32)
    std = rng.uniform(0.5, 2.0, size=(3,)).astype(np.float32)
    std[0] = 0.0                      # division blow-up path
    Z = np.asarray(normalize_windows(W, mean, std))
    assert np.isfinite(Z).all()


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(2, 400),
       q1=st.floats(0.0, 100.0), q2=st.floats(0.0, 100.0))
def test_percentile_threshold_monotone_and_gate_bound(seed, n, q1, q2):
    """Thresholds are monotone in the percentile, and the strict-> gate
    (06_test_full_pipeline.py:350) passes at most the expected tail of the
    calibration scores themselves."""
    scores = np.random.default_rng(seed).gamma(2.0, 1.0, size=(n,)).astype(np.float32)
    lo, hi = sorted((q1, q2))
    t_lo, t_hi = percentile_threshold(scores, lo), percentile_threshold(scores, hi)
    assert t_lo <= t_hi
    fpr = float((scores > t_hi).mean())
    assert fpr <= (100.0 - hi) / 100.0 + 1.0 / n + 1e-9
    assert float((scores > percentile_threshold(scores, 100.0)).mean()) == 0.0


@pytest.mark.parametrize("stride", [1, 3])
def test_make_windows_empty_series(stride):
    out = np.asarray(make_windows(np.zeros((0, 2), np.float32), 5, stride))
    assert out.shape == (0, 5, 2)
