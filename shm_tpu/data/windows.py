"""Sliding-window extraction, standardization, stitching — vectorized XLA ops.

TPU-native replacements for the reference's Python-loop window utilities:

- ``1_DOF/Scripts/datasets.py:6-71`` (compute_standardizer/standardize/destandardize/
  make_windows/stitch_windows/segment_rmse)
- ``4DOF/Scripts/03_train_vae.py:98-117`` (make_windows/compute_mean_std_from_windows/
  normalize_windows, re-implemented locally by every numbered script)
- ``4DOF/Scripts/utils/windowing.py:20-51``

The reference builds windows with ``np.stack([x[i:i+L] for i in range(...)])`` — a
Python loop allocating N copies. Here a single gather with a precomputed index grid
produces all windows in one XLA op; under ``jit`` XLA often fuses the gather into the
consumer so windows never materialize in HBM at all.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def num_windows(T: int, seq_len: int, stride: int = 1) -> int:
    """Number of sliding windows over a length-T series (0 if too short)."""
    if T < seq_len:
        return 0
    return (T - seq_len) // stride + 1


@partial(jax.jit, static_argnames=("seq_len", "stride"))
def make_windows(x: jax.Array, seq_len: int, stride: int = 1) -> jax.Array:
    """Sliding windows of a (T, F) series -> (N, seq_len, F).

    Parity: ``make_windows`` at 1_DOF/Scripts/datasets.py:25-35 and
    4DOF/Scripts/03_train_vae.py:98-102 (which returns an empty array for short
    series — callers must check ``num_windows`` first since jit needs static shapes).
    """
    T = x.shape[0]
    n = num_windows(T, seq_len, stride)
    if n <= 0:
        return jnp.zeros((0, seq_len) + x.shape[1:], dtype=x.dtype)
    starts = jnp.arange(n) * stride            # (N,)
    offs = jnp.arange(seq_len)                 # (L,)
    idx = starts[:, None] + offs[None, :]      # (N, L)
    return x[idx]                              # gather -> (N, L, F)


def compute_standardizer(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-feature mean/std over time axis of a (T, F) series; std floor 1e-6.

    Parity: 1_DOF/Scripts/datasets.py:6-14 (``std == 0 -> 1e-6``).
    """
    mean = x.mean(axis=0)
    std = x.std(axis=0)
    std = jnp.where(std == 0.0, 1e-6, std)
    return mean, std


def compute_mean_std_from_windows(W: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-feature mean/std over a window stack (N, L, F), flattened over (N, L).

    Parity: 4DOF/Scripts/03_train_vae.py:105-112.
    """
    Xflat = W.reshape(-1, W.shape[-1])
    mean = Xflat.mean(axis=0)
    std = Xflat.std(axis=0)
    std = jnp.where(std == 0.0, 1e-6, std)
    return mean, std


def standardize(x: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    return (x - mean) / std


def destandardize(xn: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    return xn * std + mean


def normalize_windows(W: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    """(W - mean) / std with non-finite values mapped to 0.

    Parity: 4DOF/Scripts/03_train_vae.py:115-117 (``np.nan_to_num(nan=0, posinf=0,
    neginf=0)``).
    """
    Z = (W - mean) / std
    return jnp.nan_to_num(Z, nan=0.0, posinf=0.0, neginf=0.0)


@partial(jax.jit, static_argnames=("full_len", "stride"))
def stitch_windows(windows: jax.Array, full_len: int, stride: int = 1) -> jax.Array:
    """Overlap-average window stack (N, L, F) back into a (full_len, F) series.

    Parity: 1_DOF/Scripts/datasets.py:38-54, but as one scatter-add instead of a
    Python loop over N windows.
    """
    N, L, F = windows.shape
    starts = jnp.arange(N) * stride
    idx = (starts[:, None] + jnp.arange(L)[None, :]).reshape(-1)     # (N*L,)
    flat = windows.reshape(-1, F).astype(jnp.float32)
    out = jnp.zeros((full_len, F), dtype=jnp.float32).at[idx].add(flat)
    cnt = jnp.zeros((full_len,), dtype=jnp.float32).at[idx].add(1.0)
    cnt = jnp.where(cnt == 0.0, 1.0, cnt)
    return out / cnt[:, None]


@partial(jax.jit, static_argnames=("segment_len",))
def segment_rmse(y_true: jax.Array, y_pred: jax.Array, segment_len: int) -> jax.Array:
    """Per-segment RMSE of (T, F) series -> (ceil(T/segment_len),).

    Parity: 1_DOF/Scripts/datasets.py:57-71 including the short final segment
    (implemented via padding + per-segment valid counts).
    """
    T, F = y_true.shape
    S = -(-T // segment_len)
    pad = S * segment_len - T
    e2 = ((y_pred - y_true) ** 2)
    e2 = jnp.pad(e2, ((0, pad), (0, 0)))
    valid = jnp.pad(jnp.ones((T,), e2.dtype), (0, pad))
    e2 = e2.reshape(S, segment_len, F).sum(axis=(1, 2))
    cnt = valid.reshape(S, segment_len).sum(axis=1) * F
    return jnp.sqrt(e2 / cnt)


def slice_frac(x: jax.Array | np.ndarray, frac: Tuple[float, float]):
    """Slice a (T, ...) array to the [frac[0], frac[1]) time fraction.

    Parity: 4DOF/Scripts/03_train_vae.py:90-95 (``int(n*f0) : int(n*f1)``,
    end clamped >= start). Host-side (shapes are data-dependent).
    """
    n = x.shape[0]
    s = int(n * float(frac[0]))
    e = max(int(n * float(frac[1])), s)
    return x[s:e]


@partial(jax.jit, static_argnames=("seq_len", "stride"))
def windows_from_series_batch(X: jax.Array, seq_len: int, stride: int = 1) -> jax.Array:
    """Batched windowing: (R, T, F) runs -> (R, N, seq_len, F) windows.

    vmapped ``make_windows`` over the run axis — used to window an entire group of
    simulated runs in one device call (the reference loops runs on host:
    4DOF/Scripts/03_train_vae.py:164-174).
    """
    return jax.vmap(lambda x: make_windows(x, seq_len, stride))(X)


__all__ = [
    "num_windows",
    "make_windows",
    "compute_standardizer",
    "compute_mean_std_from_windows",
    "standardize",
    "destandardize",
    "normalize_windows",
    "stitch_windows",
    "segment_rmse",
    "slice_frac",
    "windows_from_series_batch",
]
