"""Attention (transformer) temporal stack — the recurrence-free gate preset.

The reference gate models are sequential LSTMs (torch ``nn.LSTM``, e.g.
4DOF/Scripts/Models/temporal_vae.py:29-35). Round 2/3 measured both
recurrent families' structural ceilings on TPU v5e (BENCHMARKS.md): the
fused LSTM kernel is VPU-transcendental-bound (~22% MFU — 5 sigmoid/tanh
per cell-step), and the minGRU preset's remaining cost is its sequential
T-loop + VMEM I/O. A transformer encoder removes the time recurrence
entirely: every op is a batched matmul (QKV/output projections, the
[T, T] attention contraction, the MLP), with nothing sequential in T.

**Measured verdict (tools/probe_attention.py + probe_attention_kernel.py,
real chip, BENCHMARKS.md round 3): a QUALITY family, NOT a throughput
lever at these shapes.** The 4DOF recipe trains to the best 3-class
accuracy of the three families (0.9948 vs LSTM 0.99367 / minGRU 0.99395),
but scoring runs well below the fused LSTM kernel. The XLA lowering is
HBM-bandwidth-bound (~5x below the LSTM kernel: at B·T ~ 2M tokens every
inter-op [B, T, H] activation is ~0.5 GB and the un-fused op chain
round-trips HBM at each arrow — ~2.2x the LSTM's FLOPs at <9% MFU). The
head-packed VMEM-resident Pallas kernel (ops/fused_attention.py) recovers
+45% gate-only / +36% hybrid over that XLA path at 100% decision agreement
on the trained artifacts — it sidesteps the feared per-head [T, 32] MXU
underfill by packing all heads' scores into one full-K contraction — and
is the auto-selected scoring path on TPU, but the family still scores
~2x below the recurrent kernels (the [Tp, heads*Tp] score tensor's VMEM
traffic is irreducible at these widths).

This is NOT a parity cell — it changes the model family, so it ships as an
opt-in preset (``VAEConfig(cell="attention")``, CLI ``--cell attention``);
the default everywhere remains the reference-parity LSTM, exactly like the
``min_gru`` preset (models/minrnn.py). Like minGRU, it must be validated
per deployment.

Design notes:

- Pre-LN blocks (LayerNorm -> MHA -> residual; LayerNorm -> GELU MLP ->
  residual) + a closing LayerNorm: the stable-at-high-lr variant, needed
  because the preset trains under the reference recipes' Adam lr (1e-3).
- Sinusoidal positions (no parameters): reconstruction is position-critical
  and the fixed encoding keeps the stack length-agnostic (the serving
  surfaces dispatch multiple T buckets from one param tree).
- Encoder summary = mean-pool over T (the LSTM uses its last hidden state;
  attention has no privileged last step).
- Decoder mode (``broadcast_steps``) mirrors the reference decoder's
  constant-input contract (``h0`` tiled over T,
  4DOF/Scripts/Models/temporal_vae.py:67-68): the projected ``h0`` token is
  broadcast and the positional encoding differentiates the steps — the
  attention analogue of "learned queries + one context vector".
- No Pallas kernel: see the measured verdict above — the preset's value is
  quality/architectural diversity, and a kernel big enough to fix the
  bandwidth bound would not clear the recurrent kernels' throughput anyway.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_positions(seq_len: int, dim: int) -> jax.Array:
    """Standard fixed sin/cos positional encoding, shape [seq_len, dim], f32.

    ``pe[t, 2i] = sin(t / 10000^(2i/dim))``, ``pe[t, 2i+1] = cos(...)``;
    odd ``dim`` pads the last column with the trailing sin term's cos pair
    dropped (all stack widths here are even: 32/64/128).
    """
    half = (dim + 1) // 2
    pos = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    inv_freq = jnp.exp(
        -math.log(10000.0) * (2.0 * jnp.arange(half, dtype=jnp.float32)) / dim
    )[None, :]
    ang = pos * inv_freq                                   # [T, half]
    pe = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # [T, half, 2]
    return pe.reshape(seq_len, 2 * half)[:, :dim]


class TransformerBlock(nn.Module):
    """Pre-LN transformer encoder block over [B, T, H]."""

    hidden_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = nn.LayerNorm(dtype=self.dtype, name="attn_norm")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=self.dropout, deterministic=deterministic,
            name="attn")(h, h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, name="mlp_norm")(x)
        h = nn.Dense(self.mlp_ratio * self.hidden_dim, dtype=self.dtype,
                     name="mlp_in")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="mlp_out")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class AttentionStack(nn.Module):
    """Transformer stack with the shared temporal-stack interface:
    ``__call__(x, *, deterministic, broadcast_steps=None) -> (out, summary)``
    where ``out`` is [B, T, H] and ``summary`` is [B, H] (mean-pooled; the
    slot the LSTM/minGRU stacks fill with their last hidden state).

    ``num_heads=None`` derives ``max(1, hidden_dim // 32)`` — head size 32
    at every preset width (128 -> 4 heads, 64 -> 2, 32 -> 1).
    """

    hidden_dim: int
    num_layers: int = 1
    dropout: float = 0.0
    dtype: Any = jnp.float32
    num_heads: Optional[int] = None
    mlp_ratio: int = 4

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        deterministic: bool = True,
        broadcast_steps: Optional[int] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        H = self.hidden_dim
        heads = self.num_heads or max(1, H // 32)
        dt = self.dtype
        if broadcast_steps is None:
            B, T, _ = x.shape
            tok = nn.Dense(H, dtype=dt, name="in_proj")(x.astype(dt))
        else:
            B, _ = x.shape
            T = broadcast_steps
            # constant-input decoder contract: project the single vector
            # once, broadcast over T (positions differentiate the steps)
            tok = nn.Dense(H, dtype=dt, name="in_proj")(x.astype(dt))
            tok = jnp.broadcast_to(tok[:, None, :], (B, T, H))
        out = tok + sinusoidal_positions(T, H).astype(dt)[None]
        for layer in range(self.num_layers):
            out = TransformerBlock(
                H, heads, dropout=self.dropout, dtype=dt,
                mlp_ratio=self.mlp_ratio, name=f"layer{layer}",
            )(out, deterministic=deterministic)
        out = nn.LayerNorm(dtype=dt, name="final_norm")(out)
        return out, out.mean(axis=1)


__all__ = ["AttentionStack", "TransformerBlock", "sinusoidal_positions"]
