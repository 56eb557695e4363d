"""Attention (transformer) stack: correctness, VAE integration, guards.

The attention preset (shm_tpu/models/attention.py) is an opt-in NON-parity
temporal stack (like the minGRU cell), so there is no reference artifact to
pin against; correctness here means (a) the positional encoding and block
math are what the docstrings claim, (b) the VAE / trainer / hybrid pipeline
integration works end-to-end, and (c) every LSTM-only fast path refuses the
cell loudly instead of producing garbage.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shm_tpu.config import TrainConfig, VAEConfig
from shm_tpu.models import AttentionStack, TemporalVAE, vae_from_config
from shm_tpu.models.attention import sinusoidal_positions


def test_sinusoidal_positions_values():
    T, H = 16, 8
    pe = np.asarray(sinusoidal_positions(T, H))
    assert pe.shape == (T, H)
    t = np.arange(T, dtype=np.float64)
    for i in range(H // 2):
        freq = 1.0 / 10000.0 ** (2.0 * i / H)
        np.testing.assert_allclose(pe[:, 2 * i], np.sin(t * freq), atol=1e-6)
        np.testing.assert_allclose(pe[:, 2 * i + 1], np.cos(t * freq), atol=1e-6)
    # position 0 is [0, 1, 0, 1, ...] — distinct positions get distinct rows
    np.testing.assert_allclose(pe[0], np.tile([0.0, 1.0], H // 2), atol=1e-7)
    assert np.abs(pe[1:] - pe[:-1]).max() > 1e-3


def test_sinusoidal_positions_odd_dim():
    pe = np.asarray(sinusoidal_positions(5, 7))
    assert pe.shape == (5, 7) and np.all(np.isfinite(pe))


def test_stack_shapes_and_determinism():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 12, 4)).astype(np.float32))
    stack = AttentionStack(hidden_dim=16, num_layers=2, dropout=0.1)
    params = stack.init(jax.random.PRNGKey(0), x)
    out1, h1 = stack.apply(params, x)
    out2, h2 = stack.apply(params, x)
    assert out1.shape == (3, 12, 16) and h1.shape == (3, 16)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # summary is the mean-pool of the output sequence
    np.testing.assert_allclose(np.asarray(out1).mean(axis=1), np.asarray(h1),
                               rtol=1e-5, atol=1e-6)


def test_stack_dropout_draws_under_training():
    x = jnp.ones((2, 8, 4), jnp.float32)
    stack = AttentionStack(hidden_dim=16, num_layers=1, dropout=0.5)
    params = stack.init(jax.random.PRNGKey(0), x)
    o1, _ = stack.apply(params, x, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
    o2, _ = stack.apply(params, x, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-4


def test_broadcast_mode_equals_materialized_input():
    """Decoder constant-input mode == feeding the tiled [B, T, D] explicitly
    (the projected token is identical per step; positions differentiate)."""
    rng = np.random.default_rng(2)
    B, T, D, H = 4, 9, 5, 16
    x0 = rng.normal(size=(B, D)).astype(np.float32)
    stack = AttentionStack(hidden_dim=H, num_layers=2, dropout=0.0)
    params = stack.init(jax.random.PRNGKey(3), jnp.asarray(x0),
                        broadcast_steps=T)
    out_b, h_b = stack.apply(params, jnp.asarray(x0), broadcast_steps=T)
    x_tiled = jnp.asarray(np.repeat(x0[:, None, :], T, axis=1))
    out_m, h_m = stack.apply(params, x_tiled)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_m),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_b), np.asarray(h_m),
                               rtol=1e-5, atol=1e-5)


def test_stack_is_length_agnostic():
    """One param tree serves multiple T (the serving buckets dispatch
    several window lengths; positions are computed per call)."""
    stack = AttentionStack(hidden_dim=16, num_layers=1, dropout=0.0)
    x8 = jnp.ones((2, 8, 4), jnp.float32)
    params = stack.init(jax.random.PRNGKey(0), x8)
    out8, _ = stack.apply(params, x8)
    out20, _ = stack.apply(params, jnp.ones((2, 20, 4), jnp.float32))
    assert out8.shape == (2, 8, 16) and out20.shape == (2, 20, 16)


def test_vae_attention_forward_and_grads():
    vae = TemporalVAE(input_dim=4, latent_dim=3, hidden_dim=16, num_layers=2,
                      dropout=0.1, use_layernorm=True, cell="attention")
    x = jnp.asarray(np.random.default_rng(6).normal(size=(5, 12, 4)), jnp.float32)
    params = vae.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    recon, mu, logvar = vae.apply({"params": params}, x)
    assert recon.shape == x.shape and mu.shape == (5, 3) and logvar.shape == (5, 3)

    def loss(p):
        r, m, lv = vae.apply({"params": p}, x)
        return jnp.mean((r - x) ** 2) + jnp.mean(m**2 + jnp.exp(lv))

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert leaves and all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    # the cell actually swaps the stack: transformer blocks under the
    # encoder/decoder slots, with a [D, H] input projection
    enc = params["encoder_lstm"]
    assert enc["in_proj"]["kernel"].shape == (4, 16)
    assert "attn" in enc["layer0"]


def test_vae_from_config_attention_passthrough():
    cfg = VAEConfig(input_dim=4, latent_dim=3, hidden_dim=16, num_layers=1,
                    cell="attention")
    assert vae_from_config(cfg).cell == "attention"


def test_train_vae_attention_smoke():
    """A short CPU training run learns (loss drops) and best-val is tracked."""
    from shm_tpu.train.vae import train_vae

    rng = np.random.default_rng(7)
    t = np.linspace(0, 4 * np.pi, 30, dtype=np.float32)
    base = np.sin(t)[None, :, None] * rng.uniform(0.5, 1.5, (64, 1, 3)).astype(np.float32)
    Z = base + 0.05 * rng.normal(size=(64, 30, 3)).astype(np.float32)
    vae = TemporalVAE(input_dim=3, latent_dim=2, hidden_dim=16, num_layers=1,
                      dropout=0.0, cell="attention")
    cfg = TrainConfig(seed=0, epochs=8, batch_size=32, lr=1e-3, weight_decay=0.0,
                      grad_clip=2.0)
    res = train_vae(vae, Z[:48], Z[48:], cfg, val_sample=False)
    assert res.best_epoch >= 1
    assert res.history["train_recon"][-1] < res.history["train_recon"][0]


def test_attention_pallas_kernel_guard():
    from shm_tpu.train.vae import train_vae

    vae = TemporalVAE(input_dim=3, latent_dim=2, hidden_dim=16, num_layers=2,
                      cell="attention")
    Z = np.zeros((8, 10, 3), np.float32)
    with pytest.raises(ValueError, match="LSTM recurrence only"):
        train_vae(vae, Z, Z, TrainConfig(epochs=1, batch_size=8),
                  use_pallas_kernel=True)


def test_attention_xla_hybrid():
    from shm_tpu.models import CNN4DOF
    from shm_tpu.pipeline import make_hybrid_fn

    # (cell="attention" now ALSO has a fused kernel — routing + equivalence
    # pinned in tests/test_fused_attention.py; the transposed layout stays
    # LSTM-only)
    with pytest.raises(ValueError, match="LSTM-kernel only"):
        make_hybrid_fn(TemporalVAE(cell="attention"), None, use_fused_vae=True,
                       fused_layout="transposed")

    # the XLA hybrid path serves the cell end-to-end
    vae = TemporalVAE(input_dim=4, latent_dim=3, hidden_dim=16, num_layers=2,
                      dropout=0.0, cell="attention")
    cnn = CNN4DOF(dropout=0.0)
    W = np.random.default_rng(8).normal(size=(6, 12, 4)).astype(np.float32)
    vp = vae.init({"params": jax.random.PRNGKey(0)},
                  jnp.zeros((2, 12, 4), jnp.float32))["params"]
    cv = cnn.init({"params": jax.random.PRNGKey(1)},
                  jnp.zeros((2, 12, 4, 2), jnp.float32))
    fn = make_hybrid_fn(vae, cnn)
    out = fn(vp, cv, jnp.asarray(W), jnp.zeros((4,)), jnp.ones((4,)),
             jnp.float32(0.5))
    assert out.y_pred.shape == (6,)
    assert bool(jnp.all((out.y_pred >= 0) & (out.y_pred <= 2)))


def test_auto_fused_gate_policy_for_attention(monkeypatch):
    """Policy pin: on a TPU backend the attention cell auto-routes through
    the head-packed Pallas kernel (measured +45% gate-only / +36% hybrid at
    100% decision agreement on trained artifacts —
    tools/probe_attention_kernel.py), but ONLY at kernel-supported widths
    (hidden_dim a multiple of 32, <=128). On CPU, fused="auto" stays XLA."""
    import shm_tpu.ops as ops

    def preset(H, layers=1):
        return TemporalVAE(input_dim=3, latent_dim=2, hidden_dim=H,
                           num_layers=layers, dropout=0.0, cell="attention")

    monkeypatch.setattr(ops, "is_tpu_backend", lambda: True)
    assert ops.auto_fused_gate(preset(32)) is True
    assert ops.auto_fused_gate(preset(64)) is True
    assert ops.auto_fused_gate(preset(128, layers=2)) is True
    assert ops.auto_fused_gate(preset(16)) is False     # not head-packable
    assert ops.auto_fused_gate(preset(256)) is False    # > 128 lanes
    assert ops.auto_fused_gate(preset(64, layers=3)) is False
    monkeypatch.setattr(ops, "is_tpu_backend", lambda: False)
    assert ops.auto_fused_gate(preset(64)) is False

    # real (CPU) backend: fused="auto" runs the XLA path and stays finite
    model = preset(32)
    Z = jnp.asarray(np.random.default_rng(9).normal(size=(4, 10, 3)),
                    jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, Z)["params"]
    from shm_tpu.train.vae import reconstruction_mse

    mse = reconstruction_mse(model, params, Z, fused="auto")
    assert mse.shape == (4,) and np.all(np.isfinite(mse))
