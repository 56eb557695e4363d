"""Windowing/standardization parity vs reference NumPy semantics.

Golden values: window-count math must reproduce the committed
4DOF run_splits.json totals (SURVEY.md §6: 1001-sample runs, seq_len 100,
stride 1 -> 902 windows; fraction slicing first).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from shm_tpu.data import (
    make_windows, num_windows, compute_standardizer, compute_mean_std_from_windows,
    normalize_windows, stitch_windows, segment_rmse, slice_frac, standardize,
    destandardize,
)


def ref_make_windows(x, L, s):
    T = x.shape[0]
    if T < L:
        return np.zeros((0, L, x.shape[1]), np.float32)
    idx = range(0, T - L + 1, s)
    return np.stack([x[i:i + L] for i in idx], axis=0)


def test_make_windows_matches_reference_loop(rng):
    x = rng.normal(size=(257, 12)).astype(np.float32)
    for L, s in [(100, 1), (80, 1), (200, 20), (50, 7)]:
        if x.shape[0] < L:
            continue
        ours = np.asarray(make_windows(jnp.asarray(x), L, s))
        ref = ref_make_windows(x, L, s)
        assert ours.shape == ref.shape
        np.testing.assert_array_equal(ours, ref)


def test_window_counts_match_reference_totals():
    # 4DOF: 1001 steps; train frac (0, 0.4) -> 400 samples -> 301 windows/run;
    # 10 runs -> 3010? No: reference totals (3600 train) come from window-INDEX
    # splits of full runs: 902 windows * 0.4 -> 360 per run * 10 = 3600.
    assert num_windows(1001, 100, 1) == 902
    # fraction-sliced VAE windows (03_train_vae.py): 400-sample slice -> 301
    assert num_windows(400, 100, 1) == 301
    # openLAB: seq 200 stride 20
    assert num_windows(10397, 200, 20) == (10397 - 200) // 20 + 1


def test_short_series_returns_empty():
    x = jnp.zeros((50, 4))
    W = make_windows(x, 100, 1)
    assert W.shape == (0, 100, 4)
    assert num_windows(50, 100) == 0


def test_standardizer_std_floor(rng):
    x = rng.normal(size=(300, 3)).astype(np.float32)
    x[:, 1] = 5.0  # zero-variance channel
    mean, std = compute_standardizer(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mean), x.mean(0), atol=1e-5)
    assert float(std[1]) == pytest.approx(1e-6)
    z = standardize(jnp.asarray(x), mean, std)
    back = destandardize(z, mean, std)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)


def test_window_stats_match_reference(rng):
    W = rng.normal(size=(40, 100, 12)).astype(np.float32)
    mean, std = compute_mean_std_from_windows(jnp.asarray(W))
    flat = W.reshape(-1, 12)
    np.testing.assert_allclose(np.asarray(mean), flat.mean(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(std), flat.std(0), rtol=1e-5)


def test_normalize_windows_nan_handling(rng):
    W = rng.normal(size=(4, 10, 3)).astype(np.float32)
    W[0, 0, 0] = np.nan
    W[1, 2, 1] = np.inf
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    Z = np.asarray(normalize_windows(jnp.asarray(W), mean, std))
    assert np.isfinite(Z).all()
    assert Z[0, 0, 0] == 0.0 and Z[1, 2, 1] == 0.0


def ref_stitch(windows, full_len, stride):
    N, L, F = windows.shape
    out = np.zeros((full_len, F))
    cnt = np.zeros((full_len, 1))
    for n in range(N):
        s = n * stride
        out[s:s + L] += windows[n]
        cnt[s:s + L] += 1.0
    cnt[cnt == 0] = 1.0
    return out / cnt


def test_stitch_windows_matches_reference_loop(rng):
    T, L, F = 230, 80, 3
    x = rng.normal(size=(T, F)).astype(np.float32)
    W = ref_make_windows(x, L, 1)
    ours = np.asarray(stitch_windows(jnp.asarray(W), T, 1))
    ref = ref_stitch(W, T, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # perfect overlap-average of consistent windows reconstructs the series
    np.testing.assert_allclose(ours, x, atol=1e-5)


def test_segment_rmse_matches_reference_loop(rng):
    T, F, seg = 3001, 12, 100
    yt = rng.normal(size=(T, F))
    yp = yt + rng.normal(size=(T, F)) * 0.1
    ours = np.asarray(segment_rmse(jnp.asarray(yt), jnp.asarray(yp), seg))
    S = int(np.ceil(T / seg))
    ref = np.array([
        np.sqrt(np.mean((yp[s * seg:(s + 1) * seg] - yt[s * seg:(s + 1) * seg]) ** 2))
        for s in range(S)
    ])
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_slice_frac_semantics():
    x = np.arange(1001)[:, None]
    tr = slice_frac(x, (0.0, 0.4))
    va = slice_frac(x, (0.4, 0.7))
    te = slice_frac(x, (0.7, 1.0))
    assert tr.shape[0] == 400 and va.shape[0] == 300 and te.shape[0] == 301
    assert tr[0, 0] == 0 and va[0, 0] == 400 and te[0, 0] == 700


def test_windows_from_series_batch(rng):
    from shm_tpu.data.windows import windows_from_series_batch
    X = rng.normal(size=(3, 120, 4)).astype(np.float32)
    W = np.asarray(windows_from_series_batch(jnp.asarray(X), 50, 10))
    assert W.shape == (3, 8, 50, 4)
    for r in range(3):
        np.testing.assert_array_equal(W[r], ref_make_windows(X[r], 50, 10))
