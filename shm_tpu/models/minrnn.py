"""Parallel-scan gated recurrence (minGRU) — the opt-in fast gate cell.

The reference gate models are sequential LSTMs (torch ``nn.LSTM``; e.g.
4DOF/Scripts/Models/temporal_vae.py:29-35). On TPU that recurrence is
latency-bound: the per-step [B,H]x[H,4H] matmul plus 5 transcendentals per
cell-step cap the fused Pallas kernel at ~22% MFU (BENCHMARKS.md, round-2
transcendental-bound diagnosis) — a STRUCTURAL floor for the LSTM form.

This module implements the minGRU cell (public technique: "Were RNNs All We
Needed?", Feng et al., arXiv:2410.01201): the gate and candidate depend only
on the input, never on the previous hidden state,

    z_t  = sigmoid(W_z x_t + b_z)
    h~_t = W_h x_t + b_h
    h_t  = (1 - z_t) * h_{t-1} + z_t * h~_t

so the recurrence is a FIRST-ORDER LINEAR scan ``h_t = a_t h_{t-1} + b_t``
with ``a_t = 1 - z_t``, ``b_t = z_t * h~_t``:

- every matmul batches over [B*T] (one MXU-shaped projection per layer, no
  per-step recurrent matmul at all);
- the time dimension is an elementwise multiply-add chain — computable
  either as a cheap sequential ``lax.scan`` (per-step cost is one fused
  multiply-add on [B, H], no matmul/transcendental latency in the loop) or
  as a log(T)-depth ``lax.associative_scan`` (fully parallel over T);
- one transcendental per step (the gate sigmoid), evaluated batched over
  the whole [B, T, H] block outside the recurrence.

This is NOT a parity cell — it changes the model family, so it ships as an
opt-in preset (``VAEConfig(cell="min_gru")``, CLI ``--cell min_gru``); the
default everywhere remains the reference-parity LSTM. Quality under the
4DOF recipe is measured in BENCHMARKS.md (round 3).

Weight layout mirrors the LSTM convention here (gates concatenated in one
``w_ih`` [D, 2H] with uniform (-1/sqrt(H), +) init) so the trainers,
checkpoint I/O, and init RNG streams are structurally identical.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from shm_tpu.models.lstm import uniform_init


def linear_recurrence(a: jax.Array, b: jax.Array, *,
                      impl: str = "sequential") -> jax.Array:
    """``h_t = a_t * h_{t-1} + b_t`` with ``h_0 = 0``, along axis 0.

    ``a``/``b``: [T, ...] elementwise coefficient arrays.

    ``impl="sequential"``: ``lax.scan`` — one fused multiply-add per step.
    ``impl="associative"``: ``lax.associative_scan`` over affine-map
    composition ``(a2, b2) o (a1, b1) = (a1*a2, a2*b1 + b2)`` — log(T)
    depth, more total HBM traffic. Both are exact (same f32 operations in
    different association order; equivalence pinned in tests/test_minrnn.py).
    """
    if impl == "sequential":
        def step(h, ab):
            at, bt = ab
            h = at * h + bt
            return h, h

        h0 = jnp.zeros(a.shape[1:], a.dtype)
        _, hs = jax.lax.scan(step, h0, (a, b))
        return hs
    if impl == "associative":
        def combine(x, y):
            a1, b1 = x
            a2, b2 = y
            return a1 * a2, a2 * b1 + b2

        _, hs = jax.lax.associative_scan(combine, (a, b), axis=0)
        return hs
    raise ValueError(f"unknown linear_recurrence impl {impl!r}")


class MinGRULayer(nn.Module):
    """Single minGRU layer over [B, T, D] -> ([B, T, H], (h_T, h_T)).

    ``broadcast_steps``: constant-input decoder mode (the reference decoder
    feeds the same vector every step, 4DOF/Scripts/Models/temporal_vae.py:67-68)
    — the projection is computed once as [B, 2H]; the recurrence coefficients
    are constant over T but the scan still runs (h_t sweeps from 0 toward
    h~ at per-channel rates, giving the decoder its trajectory).
    """

    hidden_dim: int
    dtype: Any = jnp.float32
    scan_impl: str = "sequential"

    @nn.compact
    def __call__(self, x: jax.Array, broadcast_steps: Optional[int] = None
                 ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
        H = self.hidden_dim
        if broadcast_steps is None:
            B, T, D = x.shape
        else:
            B, D = x.shape
            T = broadcast_steps

        bound = 1.0 / (H ** 0.5)
        w_ih = self.param("w_ih", uniform_init(bound), (D, 2 * H))
        b_ih = self.param("b_ih", uniform_init(bound), (2 * H,))

        dt = self.dtype
        xc = x.astype(dt)
        w, bias = w_ih.astype(dt), b_ih.astype(dt)

        if broadcast_steps is None:
            # ONE batched MXU projection for all timesteps
            g = jnp.einsum("btd,dg->btg", xc, w,
                           preferred_element_type=dt) + bias     # [B, T, 2H]
            g = jnp.swapaxes(g, 0, 1)                            # [T, B, 2H]
            z = jax.nn.sigmoid(g[..., :H])
            hcand = g[..., H:]
            a = 1.0 - z
            b = z * hcand
        else:
            g = xc @ w + bias                                    # [B, 2H], once
            z = jax.nn.sigmoid(g[:, :H])
            hcand = g[:, H:]
            a = jnp.broadcast_to(1.0 - z, (T, B, H))
            b = jnp.broadcast_to(z * hcand, (T, B, H))

        hs = linear_recurrence(a, b, impl=self.scan_impl)        # [T, B, H]
        h_last = hs[-1]
        return jnp.swapaxes(hs, 0, 1), (h_last, h_last)


class MinGRUStack(nn.Module):
    """Multi-layer minGRU with inter-layer dropout (same stacking semantics
    as :class:`shm_tpu.models.lstm.LSTMStack`: dropout on every layer's
    output except the last, only when num_layers > 1)."""

    hidden_dim: int
    num_layers: int = 1
    dropout: float = 0.0
    dtype: Any = jnp.float32
    scan_impl: str = "sequential"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        deterministic: bool = True,
        broadcast_steps: Optional[int] = None,
    ):
        h_last = None
        out = x
        for layer in range(self.num_layers):
            bs = broadcast_steps if layer == 0 else None
            out, (h_last, _) = MinGRULayer(
                self.hidden_dim, dtype=self.dtype, scan_impl=self.scan_impl,
                name=f"layer{layer}"
            )(out, broadcast_steps=bs)
            if layer < self.num_layers - 1 and self.dropout > 0.0:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out, h_last


__all__ = ["MinGRULayer", "MinGRUStack", "linear_recurrence"]
