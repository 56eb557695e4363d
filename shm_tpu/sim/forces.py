"""Smoothed Gaussian excitation forces.

Parity target: ``init_force`` at 4DOF/Scripts/utils/simulation_4dof.py:25-41 —
white noise scaled by ``rms`` then a centered rolling mean (window = 0.5s/dt,
``min_periods=1``) per DOF.

Two implementations:

- ``smoothed_gaussian_force_np``: exact bit-parity with the reference, including the
  legacy ``np.random.seed`` global-RNG draw and pandas' centered-window edge handling.
  Host-side; used when regenerating reference-identical datasets.
- ``smoothed_gaussian_force``: TPU-native, ``jax.random``-keyed, batched over runs.
  The centered rolling mean is one depthwise convolution with count-corrected edges
  (numerically identical to pandas for interior and edge samples).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _window_bounds(window: int):
    """pandas centered-window offsets: covers [i - left, i + right] inclusive.

    pandas centers with ``left = window // 2`` samples behind and
    ``window - 1 - left`` ahead (for even windows the extra sample is BEHIND).
    """
    left = window // 2
    right = window - 1 - left
    return left, right


def smoothed_gaussian_force_np(
    t_total: float, dt: float, num_dofs: int, rms: float, seed: int
) -> np.ndarray:
    """Bit-exact host mirror of the reference ``init_force`` (no pandas needed).

    Returns float32 (steps, num_dofs).
    """
    np.random.seed(seed)
    steps = int(t_total / dt) + 1
    base = np.random.randn(steps, num_dofs) * rms

    window = max(int(0.5 / dt), 1)
    left, right = _window_bounds(window)
    # centered rolling mean with min_periods=1 == cumsum windowed mean with
    # edge-corrected counts
    csum = np.cumsum(np.concatenate([np.zeros((1, num_dofs)), base], axis=0), axis=0)
    i = np.arange(steps)
    lo = np.maximum(i - left, 0)
    hi = np.minimum(i + right, steps - 1)
    sums = csum[hi + 1] - csum[lo]
    cnts = (hi - lo + 1).astype(np.float64)[:, None]
    return (sums / cnts).astype(np.float32)


@partial(jax.jit, static_argnames=("steps", "num_dofs", "window"))
def _smooth(base: jax.Array, steps: int, num_dofs: int, window: int) -> jax.Array:
    left, right = _window_bounds(window)
    csum = jnp.cumsum(jnp.concatenate([jnp.zeros((1, num_dofs), base.dtype), base]), axis=0)
    i = jnp.arange(steps)
    lo = jnp.maximum(i - left, 0)
    hi = jnp.minimum(i + right, steps - 1)
    sums = csum[hi + 1] - csum[lo]
    cnts = (hi - lo + 1).astype(base.dtype)[:, None]
    return sums / cnts


def smoothed_gaussian_force(
    key: jax.Array, t_total: float, dt: float, num_dofs: int, rms: float,
    batch: int | None = None,
) -> jax.Array:
    """TPU-native smoothed Gaussian excitation.

    With ``batch=R`` returns (R, steps, num_dofs) from one key (split internally);
    otherwise (steps, num_dofs). Same smoothing semantics as the reference, driven
    by a JAX PRNG key instead of the NumPy global RNG.
    """
    steps = int(t_total / dt) + 1
    window = max(int(0.5 / dt), 1)
    shape = (steps, num_dofs) if batch is None else (batch, steps, num_dofs)
    base = jax.random.normal(key, shape, dtype=jnp.float32) * rms
    if batch is None:
        return _smooth(base, steps, num_dofs, window)
    return jax.vmap(lambda b: _smooth(b, steps, num_dofs, window))(base)


__all__ = ["smoothed_gaussian_force", "smoothed_gaussian_force_np"]
