"""minGRU parallel-scan cell: recurrence correctness, VAE integration, guards.

The minGRU preset (shm_tpu/models/minrnn.py) is an opt-in NON-parity cell, so
there is no reference artifact to pin against; correctness here means (a) the
scan implementations agree with a hand-rolled per-step loop, (b) the VAE /
trainer / hybrid pipeline integration works end-to-end, and (c) every LSTM-only
fast path refuses the cell loudly instead of producing garbage.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shm_tpu.config import TrainConfig, VAEConfig
from shm_tpu.models import MinGRUStack, TemporalVAE, linear_recurrence, vae_from_config
from shm_tpu.models.minrnn import MinGRULayer


def _ref_linear_recurrence(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    h = np.zeros(a.shape[1:], a.dtype)
    out = np.empty_like(a)
    for t in range(a.shape[0]):
        h = a[t] * h + b[t]
        out[t] = h
    return out


def test_linear_recurrence_matches_loop_both_impls():
    rng = np.random.default_rng(0)
    a = rng.uniform(0.0, 1.0, size=(37, 5, 8)).astype(np.float32)
    b = rng.normal(size=(37, 5, 8)).astype(np.float32)
    ref = _ref_linear_recurrence(a, b)
    seq = np.asarray(linear_recurrence(jnp.asarray(a), jnp.asarray(b),
                                       impl="sequential"))
    assoc = np.asarray(linear_recurrence(jnp.asarray(a), jnp.asarray(b),
                                         impl="associative"))
    np.testing.assert_allclose(seq, ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(assoc, ref, rtol=1e-5, atol=1e-5)


def test_linear_recurrence_unknown_impl():
    a = jnp.ones((3, 2))
    with pytest.raises(ValueError, match="unknown linear_recurrence impl"):
        linear_recurrence(a, a, impl="blockwise")


def test_mingru_layer_matches_manual_step():
    """The layer == sigmoid-gated convex step driven by its own projections."""
    rng = np.random.default_rng(1)
    B, T, D, H = 3, 11, 4, 6
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    layer = MinGRULayer(hidden_dim=H)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out, (h_last, _) = layer.apply(params, jnp.asarray(x))

    w = np.asarray(params["params"]["w_ih"])
    bias = np.asarray(params["params"]["b_ih"])
    g = x @ w + bias
    z = 1.0 / (1.0 + np.exp(-g[..., :H]))
    hcand = g[..., H:]
    h = np.zeros((B, H), np.float32)
    outs = []
    for t in range(T):
        h = (1.0 - z[:, t]) * h + z[:, t] * hcand[:, t]
        outs.append(h)
    ref = np.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), ref[:, -1], rtol=1e-5, atol=1e-5)


def test_mingru_broadcast_mode_equals_materialized_input():
    """Decoder constant-input mode == feeding the tiled [B, T, D] explicitly."""
    rng = np.random.default_rng(2)
    B, T, D, H = 4, 9, 5, 7
    x0 = rng.normal(size=(B, D)).astype(np.float32)
    layer = MinGRULayer(hidden_dim=H)
    params = layer.init(jax.random.PRNGKey(3), jnp.asarray(x0),
                        broadcast_steps=T)
    out_b, (h_b, _) = layer.apply(params, jnp.asarray(x0), broadcast_steps=T)
    x_tiled = jnp.asarray(np.repeat(x0[:, None, :], T, axis=1))
    out_m, (h_m, _) = layer.apply(params, x_tiled)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_m),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_b), np.asarray(h_m),
                               rtol=1e-6, atol=1e-6)


def test_mingru_stack_scan_impls_agree():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(3, 20, 4)).astype(np.float32))
    seq = MinGRUStack(hidden_dim=8, num_layers=2, scan_impl="sequential")
    assoc = MinGRUStack(hidden_dim=8, num_layers=2, scan_impl="associative")
    params = seq.init(jax.random.PRNGKey(5), x)
    o1, h1 = seq.apply(params, x)
    o2, h2 = assoc.apply(params, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-6)


def test_vae_mingru_forward_and_grads():
    vae = TemporalVAE(input_dim=4, latent_dim=3, hidden_dim=8, num_layers=2,
                      dropout=0.1, use_layernorm=True, cell="min_gru")
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
    # the cell actually swaps the recurrence: minGRU layers carry a [D, 2H]
    # projection, the LSTM's is [D, 4H]
    w = params["encoder_lstm"]["layer0"]["w_ih"]
    assert w.shape == (4, 16)


def test_vae_scan_impl_field_agrees():
    x = jnp.asarray(np.random.default_rng(10).normal(size=(3, 14, 4)),
                    jnp.float32)
    kw = dict(input_dim=4, latent_dim=3, hidden_dim=8, num_layers=2,
              dropout=0.0, cell="min_gru")
    seq = TemporalVAE(**kw)
    assoc = TemporalVAE(**kw, scan_impl="associative")
    params = seq.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    r1, m1, _ = seq.apply({"params": params}, x)
    r2, m2, _ = assoc.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                               rtol=1e-5, atol=1e-6)


def test_vae_unknown_cell_raises():
    vae = TemporalVAE(input_dim=4, latent_dim=3, hidden_dim=8, cell="gru")
    with pytest.raises(ValueError, match="unknown cell"):
        vae.init({"params": jax.random.PRNGKey(0)},
                 jnp.zeros((2, 6, 4), jnp.float32))


def test_vae_from_config_cell_passthrough():
    cfg = VAEConfig(input_dim=4, latent_dim=3, hidden_dim=8, num_layers=1,
                    cell="min_gru")
    assert vae_from_config(cfg).cell == "min_gru"
    assert vae_from_config(VAEConfig()).cell == "lstm"


def test_train_vae_mingru_smoke():
    """A short CPU training run learns (loss drops) and best-val is tracked."""
    from shm_tpu.train.vae import train_vae

    rng = np.random.default_rng(7)
    t = np.linspace(0, 4 * np.pi, 30, dtype=np.float32)
    base = np.sin(t)[None, :, None] * rng.uniform(0.5, 1.5, (64, 1, 3)).astype(np.float32)
    Z = base + 0.05 * rng.normal(size=(64, 30, 3)).astype(np.float32)
    vae = TemporalVAE(input_dim=3, latent_dim=2, hidden_dim=8, num_layers=1,
                      dropout=0.0, cell="min_gru")
    cfg = TrainConfig(seed=0, epochs=8, batch_size=32, lr=1e-2, weight_decay=0.0,
                      grad_clip=2.0)
    res = train_vae(vae, Z[:48], Z[48:], cfg, val_sample=False)
    assert res.best_epoch >= 1
    assert res.history["train_recon"][-1] < res.history["train_recon"][0]


def test_mingru_pallas_kernel_guard():
    from shm_tpu.train.vae import train_vae

    vae = TemporalVAE(input_dim=3, latent_dim=2, hidden_dim=8, num_layers=2,
                      cell="min_gru")
    Z = np.zeros((8, 10, 3), np.float32)
    with pytest.raises(ValueError, match="LSTM recurrence only"):
        train_vae(vae, Z, Z, TrainConfig(epochs=1, batch_size=8),
                  use_pallas_kernel=True)


def test_unknown_cell_fused_guard_and_xla_hybrid():
    from shm_tpu.models import CNN4DOF
    from shm_tpu.pipeline import make_hybrid_fn

    with pytest.raises(ValueError, match="no fused kernel"):
        make_hybrid_fn(TemporalVAE(cell="rwkv"), None, use_fused_vae=True)
    with pytest.raises(ValueError, match="LSTM-kernel only"):
        make_hybrid_fn(TemporalVAE(cell="min_gru"), None, use_fused_vae=True,
                       fused_layout="transposed")

    # the XLA hybrid path serves the cell end-to-end
    vae = TemporalVAE(input_dim=4, latent_dim=3, hidden_dim=8, num_layers=2,
                      dropout=0.0, cell="min_gru")
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


def test_reconstruction_mse_explicit_nonfused_for_mingru():
    model = TemporalVAE(input_dim=3, latent_dim=2, hidden_dim=8, num_layers=1,
                        dropout=0.0, cell="min_gru")
    Z = jnp.asarray(np.random.default_rng(9).normal(size=(4, 10, 3)),
                    jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, Z)["params"]
    from shm_tpu.train.vae import reconstruction_mse

    mse = reconstruction_mse(model, params, Z, fused=False)
    assert mse.shape == (4,) and np.all(np.isfinite(mse))


# ---------------------------------------------------------------------------
# fused minGRU Pallas kernel (interpret mode on CPU) vs the flax model
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def kernel_setup():
    from shm_tpu.config import VAEConfig as _V
    from shm_tpu.models import vae_from_config

    cfg = _V(12, 16, 128, 2, 0.3, use_layernorm=True, cell="min_gru")
    model = vae_from_config(cfg)
    Z = jax.random.normal(jax.random.PRNGKey(0), (96, 40, 12))
    params = model.init({"params": jax.random.PRNGKey(1)}, Z[:2])["params"]
    return model, params, Z


def test_fused_mingru_matches_flax(kernel_setup):
    from shm_tpu.ops import fused_mingru_gate

    model, params, Z = kernel_setup
    recon, mu, logvar = model.apply({"params": params}, Z)
    mse_ref = np.asarray(((Z - recon) ** 2).mean(axis=(1, 2)))
    resid_ref = np.asarray((Z - recon) ** 2)

    mse, resid = fused_mingru_gate(params, Z, dtype=jnp.float32,
                                   interpret=True, batch_tile=32,
                                   sigmoid_impl="exact")
    np.testing.assert_allclose(np.asarray(mse), mse_ref, atol=2e-6)
    np.testing.assert_allclose(np.asarray(resid), resid_ref, atol=5e-6)


def test_fused_mingru_ragged_and_gate_only(kernel_setup):
    from shm_tpu.ops import fused_mingru_gate

    model, params, Z = kernel_setup
    Zr = Z[:41]
    recon, _, _ = model.apply({"params": params}, Zr)
    mse_ref = np.asarray(((Zr - recon) ** 2).mean(axis=(1, 2)))
    mse, resid = fused_mingru_gate(params, Zr, dtype=jnp.float32,
                                   interpret=True, batch_tile=32,
                                   sigmoid_impl="exact", with_residual=False)
    assert resid is None
    assert mse.shape == (41,)
    np.testing.assert_allclose(np.asarray(mse), mse_ref, atol=2e-6)


def test_fused_mingru_one_layer_no_layernorm():
    from shm_tpu.ops import fused_mingru_gate

    model = TemporalVAE(input_dim=3, latent_dim=8, hidden_dim=64, num_layers=1,
                        dropout=0.2, use_layernorm=False, cell="min_gru")
    Z = jax.random.normal(jax.random.PRNGKey(2), (40, 25, 3))
    params = model.init({"params": jax.random.PRNGKey(3)}, Z[:2])["params"]
    recon, _, _ = model.apply({"params": params}, Z)
    mse_ref = np.asarray(((Z - recon) ** 2).mean(axis=(1, 2)))
    mse, _ = fused_mingru_gate(params, Z, dtype=jnp.float32,
                               num_layers=1, use_layernorm=False,
                               interpret=True, batch_tile=8,
                               sigmoid_impl="exact")
    np.testing.assert_allclose(np.asarray(mse), mse_ref, atol=2e-6)


def test_fused_mingru_three_layers_matches_flax():
    """Depth generalization: each non-final encoder layer must STORE its
    hidden sequence so the next layer projects from the right inputs (a
    round-3 review caught layer >= 3 silently projecting from layer 0)."""
    from shm_tpu.ops import fused_mingru_gate

    model = TemporalVAE(input_dim=4, latent_dim=5, hidden_dim=16, num_layers=3,
                        dropout=0.1, use_layernorm=True, cell="min_gru")
    Z = jax.random.normal(jax.random.PRNGKey(5), (24, 18, 4))
    params = model.init({"params": jax.random.PRNGKey(6)}, Z[:2])["params"]
    recon, _, _ = model.apply({"params": params}, Z)
    mse_ref = np.asarray(((Z - recon) ** 2).mean(axis=(1, 2)))
    mse, _ = fused_mingru_gate(params, Z, dtype=jnp.float32, num_layers=3,
                               use_layernorm=True, interpret=True,
                               batch_tile=8, sigmoid_impl="exact")
    np.testing.assert_allclose(np.asarray(mse), mse_ref, atol=2e-6)


def test_fused_mingru_sigmoid_impls_close(kernel_setup):
    from shm_tpu.ops import fused_mingru_gate

    model, params, Z = kernel_setup
    kw = dict(dtype=jnp.float32, interpret=True, batch_tile=32,
              with_residual=False)
    mse_t, _ = fused_mingru_gate(params, Z[:32], sigmoid_impl="tanh", **kw)
    mse_e, _ = fused_mingru_gate(params, Z[:32], sigmoid_impl="exact", **kw)
    np.testing.assert_allclose(np.asarray(mse_t), np.asarray(mse_e), rtol=1e-4)
    with pytest.raises(ValueError, match="unknown sigmoid_impl"):
        fused_mingru_gate(params, Z[:32], sigmoid_impl="fast", **kw)


def test_fused_mingru_batch_tile_guard(kernel_setup):
    from shm_tpu.ops import fused_mingru_gate

    _, params, Z = kernel_setup
    with pytest.raises(ValueError, match="multiple of 128"):
        fused_mingru_gate(params, Z[:32], batch_tile=32, interpret=False)


def test_hybrid_fused_mingru_matches_xla(kernel_setup):
    """make_hybrid_fn(use_fused_vae=True) on a min_gru model == the XLA path."""
    from shm_tpu.models import CNN4DOF
    from shm_tpu.pipeline import make_hybrid_fn

    model, params, Z = kernel_setup
    cnn = CNN4DOF(dropout=0.0)
    cv = cnn.init({"params": jax.random.PRNGKey(4)},
                  jnp.zeros((2, 40, 12, 2), jnp.float32))
    W = np.asarray(Z[:48]) * 2.0 + 1.0
    mean, std = np.full((12,), 1.0, np.float32), np.full((12,), 2.0, np.float32)
    ref_fn = make_hybrid_fn(model, cnn)
    got_fn = make_hybrid_fn(model, cnn, use_fused_vae=True,
                            fused_dtype=jnp.float32, fused_interpret=True,
                            fused_batch_tile=16)
    thr = jnp.float32(np.median(np.asarray(ref_fn(
        params, cv, jnp.asarray(W), mean, std, jnp.float32(0.0)).mse)))
    ref = ref_fn(params, cv, jnp.asarray(W), mean, std, thr)
    got = got_fn(params, cv, jnp.asarray(W), mean, std, thr)
    np.testing.assert_allclose(np.asarray(got.mse), np.asarray(ref.mse),
                               rtol=1e-4, atol=1e-6)
    assert (np.asarray(got.anomalous) == np.asarray(ref.anomalous)).all()
    assert (np.asarray(got.y_pred) == np.asarray(ref.y_pred)).all()
