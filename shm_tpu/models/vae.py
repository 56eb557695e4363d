"""Temporal (LSTM) Variational Autoencoder — the anomaly-gate model family.

TPU-native rebuild of the reference's three copy-pasted LSTM-VAE variants:

- 1-DOF: ``1_DOF/Scripts/Models/temporal_vae.py:7-64`` (no LayerNorm)
- 4-DOF: ``4DOF/Scripts/Models/temporal_vae.py:8-82`` (LayerNorm on h_last)
- openLAB: ``20250506_openLAB_tests/Codes/Models/temporal_vae_model.py:4-66``

Topology (all variants): LSTM encoder -> last hidden state [-> LayerNorm] ->
fc_mu / fc_logvar -> reparameterize -> ``tanh(fc(z))`` broadcast over T as the
decoder-LSTM input -> linear output head.

Differences from the torch original, by design:

- sampling is explicit: ``sample=True`` draws eps from the ``"reparam"`` RNG stream;
  ``sample=False`` decodes the posterior mean (deterministic inference — the torch
  scripts sample even under ``eval()``/``no_grad``, e.g.
  4DOF/Scripts/04_vae_thresholding.py:113-124, which makes gate scores stochastic;
  both behaviors are supported, calibration and the gate just have to agree).
- the decoder's constant input uses ``broadcast_steps`` (no [B, T, H] repeat).
- ``dtype`` selects the compute precision (bfloat16 for the MXU); params stay fp32.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from shm_tpu.config import VAEConfig
from shm_tpu.models.lstm import LSTMStack, uniform_init


def torch_linear_init(fan_in: int):
    """torch ``nn.Linear`` default init: kernel & bias ~ U(-1/sqrt(fan_in), +)."""
    return uniform_init(1.0 / (fan_in ** 0.5))


class TemporalVAE(nn.Module):
    """``cell``: the temporal-stack family. ``"lstm"`` (default) is the
    reference-parity sequential LSTM; ``"min_gru"`` is the opt-in
    parallel-scan cell (:mod:`shm_tpu.models.minrnn`, the measured TPU
    throughput lever); ``"attention"`` is the opt-in recurrence-free
    transformer stack (:mod:`shm_tpu.models.attention`, a quality-parity
    family that scores slower — see its module docstring) — same VAE
    topology, different (non-parity) temporal stacks."""

    input_dim: int = 12
    latent_dim: int = 16
    hidden_dim: int = 128
    num_layers: int = 2
    dropout: float = 0.3
    use_layernorm: bool = True
    dtype: Any = jnp.float32
    cell: str = "lstm"
    # time-scan lowering for cell="min_gru" ("sequential" | "associative");
    # ignored by the LSTM cell
    scan_impl: str = "sequential"

    def setup(self):
        H, Z, D = self.hidden_dim, self.latent_dim, self.input_dim
        if self.cell == "lstm":
            def Stack(H, L, drop, dt, name):
                return LSTMStack(H, L, drop, dt, name=name)
        elif self.cell == "min_gru":
            from shm_tpu.models.minrnn import MinGRUStack

            def Stack(H, L, drop, dt, name):
                return MinGRUStack(H, L, drop, dt, scan_impl=self.scan_impl,
                                   name=name)
        elif self.cell == "attention":
            from shm_tpu.models.attention import AttentionStack

            def Stack(H, L, drop, dt, name):
                return AttentionStack(H, L, drop, dt, name=name)
        else:
            raise ValueError(f"unknown cell {self.cell!r} "
                             "(expected 'lstm', 'min_gru' or 'attention')")
        self.encoder = Stack(H, self.num_layers, self.dropout, self.dtype,
                             name="encoder_lstm")
        if self.use_layernorm:
            # epsilon MUST be torch's 1e-5 (not flax's 1e-6 default): the
            # encoder's final hidden state has variance ~1.7e-3 at init, so
            # the eps difference shifts the normalized output by ~1e-2 and
            # breaks gradient parity with the reference at the 0.8% level
            # (measured in tools/probe_vae_offset.py; the r3 VERDICT's
            # "systematic 4DOF val-loss offset" investigation)
            self.layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.fc_mu = nn.Dense(Z, kernel_init=torch_linear_init(H),
                              bias_init=torch_linear_init(H), dtype=self.dtype)
        self.fc_logvar = nn.Dense(Z, kernel_init=torch_linear_init(H),
                                  bias_init=torch_linear_init(H), dtype=self.dtype)
        self.fc_latent_to_hidden = nn.Dense(H, kernel_init=torch_linear_init(Z),
                                            bias_init=torch_linear_init(Z),
                                            dtype=self.dtype)
        self.decoder = Stack(H, self.num_layers, self.dropout, self.dtype,
                             name="decoder_lstm")
        self.output_layer = nn.Dense(D, kernel_init=torch_linear_init(H),
                                     bias_init=torch_linear_init(H), dtype=self.dtype)

    def encode(self, x: jax.Array, deterministic: bool = True):
        _, h_last = self.encoder(x, deterministic=deterministic)
        if self.use_layernorm:
            h_last = self.layer_norm(h_last)
        return self.fc_mu(h_last), self.fc_logvar(h_last)

    def decode(self, z: jax.Array, seq_len: int, deterministic: bool = True):
        h0 = jnp.tanh(self.fc_latent_to_hidden(z))        # [B, H]
        decoded, _ = self.decoder(h0, deterministic=deterministic,
                                  broadcast_steps=seq_len)
        return self.output_layer(decoded)                  # [B, T, D]

    def __call__(
        self,
        x: jax.Array,
        *,
        sample: bool = False,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        seq_len = x.shape[1]
        mu, logvar = self.encode(x, deterministic)
        if sample:
            eps = jax.random.normal(self.make_rng("reparam"), mu.shape, mu.dtype)
            z = mu + eps * jnp.exp(0.5 * logvar)
        else:
            z = mu
        recon = self.decode(z, seq_len, deterministic)
        return recon.astype(jnp.float32), mu.astype(jnp.float32), logvar.astype(jnp.float32)


def vae_from_config(cfg: VAEConfig, dtype: Any = jnp.float32) -> TemporalVAE:
    return TemporalVAE(
        input_dim=cfg.input_dim,
        latent_dim=cfg.latent_dim,
        hidden_dim=cfg.hidden_dim,
        num_layers=cfg.num_layers,
        dropout=cfg.dropout,
        use_layernorm=cfg.use_layernorm,
        dtype=dtype,
        cell=getattr(cfg, "cell", "lstm"),
    )


def vae_loss(
    recon: jax.Array, x: jax.Array, mu: jax.Array, logvar: jax.Array,
    kl_weight: jax.Array | float,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """total = MSE(recon, x) + w * KL, both mean-reduced.

    Parity: 4DOF/Scripts/03_train_vae.py:264-266 (``F.mse_loss(reduction="mean")``
    and ``-0.5 * mean(1 + logvar - mu^2 - exp(logvar))``).

    ``mask``: optional per-window validity (B,) for padded batches; masked means
    reproduce the unpadded reduction exactly.
    """
    if mask is None:
        recon_loss = jnp.mean((recon - x) ** 2)
        kl = -0.5 * jnp.mean(1.0 + logvar - mu**2 - jnp.exp(logvar))
    else:
        m = mask.astype(recon.dtype)
        denom_r = jnp.maximum(m.sum() * x.shape[1] * x.shape[2], 1.0)
        recon_loss = jnp.sum(((recon - x) ** 2) * m[:, None, None]) / denom_r
        denom_k = jnp.maximum(m.sum() * mu.shape[1], 1.0)
        kl_terms = (1.0 + logvar - mu**2 - jnp.exp(logvar)) * m[:, None]
        kl = -0.5 * jnp.sum(kl_terms) / denom_k
    return recon_loss + kl_weight * kl, recon_loss, kl


__all__ = ["TemporalVAE", "vae_from_config", "vae_loss", "torch_linear_init"]
