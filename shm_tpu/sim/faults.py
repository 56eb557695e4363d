"""Sensor-fault injectors and structural-fault case generation, PRNG-keyed.

Parity target: 4DOF/Scripts/02_generate_fault_datasets.py:128-221.

The reference injects faults with the NumPy global RNG on one DOF-triplet
(x_k, v_k, a_k) of a nominal run; magnitudes are ``rel_mag * std(channel)``
(pandas ``Series.std`` — ddof=1). Structural faults re-simulate with globally
scaled stiffness (handled by ``shm_tpu.sim.newmark.simulate_runs``; see
``shm_tpu.cli.stage4dof``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def inject_noise(key: jax.Array, x: jax.Array, magnitude: jax.Array) -> jax.Array:
    """Additive Gaussian noise N(0, magnitude). (:129-130)"""
    return x + magnitude * jax.random.normal(key, x.shape, x.dtype)


def inject_spikes(
    key: jax.Array, x: jax.Array, magnitude: jax.Array, freq: float = 0.01
) -> jax.Array:
    """Spikes on ``int(n*freq)`` unique positions, N(magnitude, magnitude/4). (:133-138)

    Implemented jit-friendly: draw a random permutation, spike the first k slots.
    """
    n = x.shape[0]
    k = int(n * freq)
    kperm, kmag = jax.random.split(key)
    perm = jax.random.permutation(kperm, n)
    mags = magnitude + (magnitude / 4.0) * jax.random.normal(kmag, (n,), x.dtype)
    hit = jnp.zeros((n,), bool).at[perm[:k]].set(True)
    return jnp.where(hit, x + mags, x)


def inject_drift(x: jax.Array, magnitude: jax.Array) -> jax.Array:
    """Linear drift from 0 to magnitude. (:141-142)"""
    n = x.shape[0]
    return x + jnp.linspace(0.0, 1.0, n).astype(x.dtype) * magnitude


def inject_bias(x: jax.Array, magnitude: jax.Array) -> jax.Array:
    """Constant offset. (:145-146)"""
    return x + magnitude


def _std_ddof1(x: jax.Array) -> jax.Array:
    return jnp.std(x, ddof=1)


FAULT_KINDS = ("noise", "spikes", "drift", "bias")


def inject_sensor_fault_triplet(
    key: jax.Array,
    run: jax.Array,          # (T, 3*nd) laid out [x | v | a]
    kind: str,
    dof: int,                # 1-based, matching the reference
    rel_mag: float,
    num_dofs: int = 4,
    spikes_freq: float = 0.01,
) -> jax.Array:
    """Corrupt the (x_k, v_k, a_k) triplet of one run.

    Per-channel magnitude = rel_mag * std(channel) with std floor 1.0 when std==0
    (generate_sensor_faults at :203-207). Returns a new (T, 3*nd) array.
    """
    if kind not in FAULT_KINDS:
        raise ValueError(f"unknown fault kind {kind!r}")
    cols = [dof - 1, num_dofs + dof - 1, 2 * num_dofs + dof - 1]
    out = run
    keys = jax.random.split(key, len(cols))
    for c, k in zip(cols, keys):
        ch = run[:, c]
        std = _std_ddof1(ch)
        mag = jnp.where(std > 0, std, 1.0) * rel_mag
        if kind == "noise":
            new = inject_noise(k, ch, mag)
        elif kind == "spikes":
            new = inject_spikes(k, ch, mag, spikes_freq)
        elif kind == "drift":
            new = inject_drift(ch, mag)
        else:
            new = inject_bias(ch, mag)
        out = out.at[:, c].set(new)
    return out


# The reference's four sensor-fault datasets (:185-191):
# name -> (kind, corrupt dof, relative magnitude)
SENSOR_FAULT_CASES: Tuple[Tuple[str, str, int, float], ...] = (
    ("noise_x4", "noise", 4, 0.50),
    ("spikes_x1", "spikes", 1, 5.00),
    ("drift_x2", "drift", 2, 10.0),
    ("bias_x3", "bias", 3, 2.00),
)


__all__ = [
    "inject_noise",
    "inject_spikes",
    "inject_drift",
    "inject_bias",
    "inject_sensor_fault_triplet",
    "SENSOR_FAULT_CASES",
    "FAULT_KINDS",
]
