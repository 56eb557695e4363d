"""Simulator parity: SDOF/NDOF Newmark integrators, forces, variants, faults."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shm_tpu.config import SDOFParams, SystemConfig
from shm_tpu.sim import (
    simulate_free_vibration_sdof, simulate_runs, smoothed_gaussian_force_np,
    smoothed_gaussian_force, make_clean_variants, make_unseen_variants,
    inject_sensor_fault_triplet, compute_matrices,
)
from shm_tpu.sim.signals import variants_to_matrix, SEEN_COLUMNS, UNSEEN_COLUMNS

REF_4DOF = "/root/reference/4DOF"


def ref_sdof(p: SDOFParams):
    """Direct NumPy port of the reference math (signals_1dof.py:24-64)."""
    t = np.arange(0.0, p.t_total + p.dt, p.dt)
    n = len(t)
    x = np.zeros(n); v = np.zeros(n); a = np.zeros(n)
    x[0], v[0] = p.x0, p.v0
    a[0] = (-p.k * x[0] - p.c * v[0]) / p.m
    beta, gamma = 0.25, 0.5
    k_eff = p.m / (beta * p.dt ** 2) + gamma * p.c / (beta * p.dt) + p.k
    for i in range(1, n):
        b = p.m * ((1 / (beta * p.dt ** 2)) * x[i - 1]
                   + (1 / (beta * p.dt)) * v[i - 1]
                   + ((1 / (2 * beta)) - 1) * a[i - 1]) \
            - p.c * (v[i - 1] + (1 - gamma) * p.dt * a[i - 1])
        x[i] = b / k_eff
        a[i] = ((1 / (beta * p.dt ** 2)) * (x[i] - x[i - 1])
                - (1 / (beta * p.dt)) * v[i - 1]
                - ((1 / (2 * beta)) - 1) * a[i - 1])
        v[i] = v[i - 1] + p.dt * ((1 - gamma) * a[i - 1] + gamma * a[i])
    return t, x, v, a


def test_sdof_matches_reference_math():
    p = SDOFParams()
    t, x, v, a = simulate_free_vibration_sdof(p)
    tr, xr, vr, ar = ref_sdof(p)
    assert t.shape == tr.shape == (3001,)
    # fp32 scan vs fp64 loop: allow accumulated single-precision drift
    np.testing.assert_allclose(np.asarray(x), xr, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v), vr, atol=2e-4)
    np.testing.assert_allclose(np.asarray(a), ar, atol=2e-3)


def test_force_parity_with_pandas_rolling():
    import pandas as pd

    np.random.seed(7)
    steps = int(10.0 / 0.01) + 1
    base = np.random.randn(steps, 4) * 200.0
    w = int(0.5 / 0.01)
    expected = np.stack([
        pd.Series(base[:, j]).rolling(window=w, center=True, min_periods=1)
        .mean().to_numpy() for j in range(4)
    ], axis=1).astype(np.float32)
    ours = smoothed_gaussian_force_np(10.0, 0.01, 4, 200.0, 7)
    np.testing.assert_allclose(ours, expected, atol=1e-4)


def test_jax_force_shape_and_stats():
    f = smoothed_gaussian_force(jax.random.PRNGKey(0), 10.0, 0.01, 4, 200.0, batch=3)
    assert f.shape == (3, 1001, 4)
    # smoothing with window 50 shrinks std roughly by sqrt(50)
    s = float(jnp.std(f))
    assert 10.0 < s < 60.0


@pytest.mark.skipif(not os.path.isdir(REF_4DOF), reason="reference data not mounted")
def test_ndof_matches_committed_reference_run():
    """Golden-data check: the nominal fault run (default config, rms=200, seed=42)
    is committed in the reference tree as the un-corrupted channels of bias_x3."""
    cfg = SystemConfig()
    f = smoothed_gaussian_force_np(cfg.t_total, cfg.dt, cfg.num_dofs, 200.0, 42)
    out = simulate_runs(np.array(cfg.mass)[None], np.array(cfg.stiffness)[None],
                        np.array([0.02]), f[None], cfg)[0]
    ref = np.loadtxt(
        os.path.join(REF_4DOF, "Data/raw/faults/sensor_fault/bias_x3/bias_x3.csv"),
        delimiter=",", skiprows=1)
    cols = [0, 1, 3, 4, 5, 7, 8, 9, 11]  # all but the biased DOF-3 triplet
    scale = np.abs(ref[:, cols]).max(axis=0)
    err = np.abs(np.asarray(out)[:, cols] - ref[:, cols]).max(axis=0)
    assert (err / scale < 1e-4).all()


def test_ndof_batched_matches_loop():
    cfg = SystemConfig()
    rng = np.random.default_rng(1)
    R = 3
    mass = np.array(cfg.mass) * rng.uniform(0.98, 1.02, (R, 4))
    stiff = np.array(cfg.stiffness) * rng.uniform(0.98, 1.02, (R, 4))
    zeta = rng.uniform(0.015, 0.025, R)
    forces = np.stack([
        smoothed_gaussian_force_np(cfg.t_total, cfg.dt, 4, 50.0, s) for s in range(R)
    ])
    batched = np.asarray(simulate_runs(mass, stiff, zeta, forces, cfg))
    for r in range(R):
        single = np.asarray(simulate_runs(mass[r:r+1], stiff[r:r+1], zeta[r:r+1],
                                          forces[r:r+1], cfg))[0]
        np.testing.assert_allclose(batched[r], single, atol=1e-6)


def test_rayleigh_damping_is_psd_and_symmetric():
    m = jnp.array([60.0, 50.0, 50.0, 40.0])
    k = jnp.array([3e5, 2.4e5, 2e5, 1.6e5])
    M, C, K = compute_matrices(m, k, 0.02)
    C = np.asarray(C)
    np.testing.assert_allclose(C, C.T, atol=1e-8)
    assert (np.linalg.eigvalsh(C) > 0).all()


def test_clean_variants_match_reference_formulas():
    t = jnp.linspace(0.0, 30.0, 3001)
    x = jnp.sin(t); v = jnp.cos(t); a = -jnp.sin(t)
    var = make_clean_variants(t, x, v, a)
    assert set(var.keys()) == set(SEEN_COLUMNS)
    np.testing.assert_allclose(np.asarray(var["x_drift"]),
                               np.asarray(x) + 0.001 * np.asarray(t), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var["v_amplitude_scaled"]),
                               1.5 * np.asarray(v), atol=1e-6)
    # lowfreq = interp at alpha*t
    expect = np.interp(np.asarray(t) * 0.6, np.asarray(t), np.asarray(x))
    np.testing.assert_allclose(np.asarray(var["x_lowfreq"]), expect, atol=1e-5)
    M = variants_to_matrix(var, SEEN_COLUMNS)
    assert M.shape == (3001, 12)


def test_unseen_variants_match_reference_formulas():
    t = jnp.linspace(0.0, 30.0, 3001)
    var = make_unseen_variants(t)
    assert set(var.keys()) == set(UNSEEN_COLUMNS)
    tn = np.asarray(t)
    np.testing.assert_allclose(np.asarray(var["x_original"]),
                               0.01 * np.sin(2 * np.pi * 0.33 * tn), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var["x_square"]),
                               0.01 * np.sign(np.sin(2 * np.pi * 0.33 * tn)), atol=1e-6)
    # v via np.gradient parity
    dt = tn[1] - tn[0]
    np.testing.assert_allclose(np.asarray(var["v_triangle"]),
                               np.gradient(np.asarray(var["x_triangle"]), dt), atol=1e-4)


def test_sensor_fault_injectors():
    rng = np.random.default_rng(3)
    run = rng.normal(size=(1001, 12)).astype(np.float32)
    key = jax.random.PRNGKey(0)

    # bias on DOF 3: columns 2, 6, 10 shifted by 2*std(ddof=1)
    out = np.asarray(inject_sensor_fault_triplet(key, jnp.asarray(run), "bias", 3, 2.0))
    for c in (2, 6, 10):
        expected = 2.0 * run[:, c].std(ddof=1)
        np.testing.assert_allclose(out[:, c] - run[:, c], expected, rtol=1e-4)
    untouched = [i for i in range(12) if i not in (2, 6, 10)]
    np.testing.assert_array_equal(out[:, untouched], run[:, untouched])

    # drift on DOF 2: linear 0 -> 10*std
    out = np.asarray(inject_sensor_fault_triplet(key, jnp.asarray(run), "drift", 2, 10.0))
    d = out[:, 1] - run[:, 1]
    assert d[0] == pytest.approx(0.0, abs=1e-5)
    assert d[-1] == pytest.approx(10.0 * run[:, 1].std(ddof=1), rel=1e-4)

    # spikes on DOF 1: exactly 1% of samples changed
    out = np.asarray(inject_sensor_fault_triplet(key, jnp.asarray(run), "spikes", 1, 5.0))
    changed = (out[:, 0] != run[:, 0]).sum()
    assert changed == int(1001 * 0.01)

    # noise on DOF 4: std of delta ~ 0.5*std(channel)
    out = np.asarray(inject_sensor_fault_triplet(key, jnp.asarray(run), "noise", 4, 0.5))
    d = out[:, 3] - run[:, 3]
    assert d.std() == pytest.approx(0.5 * run[:, 3].std(ddof=1), rel=0.15)
