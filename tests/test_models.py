"""Model-family tests: shapes, parameter counts, loss math, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shm_tpu.config import VAEConfig, CNNConfig
from shm_tpu.models import TemporalVAE, CNN4DOF, CNNOpenLab, vae_from_config
from shm_tpu.models.vae import vae_loss
from shm_tpu.models.lstm import LSTMStack


def n_params(tree):
    return sum(x.size for x in jax.tree.leaves(tree))


def torch_lstm_param_count(D, H, layers):
    total = 0
    for l in range(layers):
        din = D if l == 0 else H
        total += 4 * H * din + 4 * H * H + 8 * H
    return total


def test_lstm_param_count_matches_torch():
    model = LSTMStack(hidden_dim=128, num_layers=2)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 10, 12)))
    assert n_params(params) == torch_lstm_param_count(12, 128, 2)


def test_lstm_broadcast_equals_repeated_input():
    model = LSTMStack(hidden_dim=16, num_layers=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8))
    params = model.init(jax.random.PRNGKey(0), x, broadcast_steps=5)
    out_b, h_b = model.apply(params, x, broadcast_steps=5)
    x_rep = jnp.repeat(x[:, None, :], 5, axis=1)
    out_r, h_r = model.apply(params, x_rep)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_b), np.asarray(h_r), atol=1e-6)


def test_lstm_matches_torch_cell_numerics():
    """Cross-check the scan cell against torch.nn.LSTM with copied weights."""
    torch = pytest.importorskip("torch")
    B, T, D, H = 4, 12, 6, 8
    model = LSTMStack(hidden_dim=H, num_layers=2)
    x = np.random.default_rng(0).normal(size=(B, T, D)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    ref = torch.nn.LSTM(D, H, num_layers=2, batch_first=True)
    with torch.no_grad():
        for l in range(2):
            p = params[f"layer{l}"]
            getattr(ref, f"weight_ih_l{l}").copy_(torch.tensor(np.asarray(p["w_ih"]).T))
            getattr(ref, f"weight_hh_l{l}").copy_(torch.tensor(np.asarray(p["w_hh"]).T))
            getattr(ref, f"bias_ih_l{l}").copy_(torch.tensor(np.asarray(p["b_ih"])))
            getattr(ref, f"bias_hh_l{l}").copy_(torch.tensor(np.asarray(p["b_hh"])))
        out_t, (h_t, _) = ref(torch.tensor(x))
    out_j, h_j = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(h_j), h_t[-1].numpy(), atol=2e-6)


@pytest.mark.parametrize("preset,cfg", [
    ("1dof", VAEConfig(12, 5, 32, 2, 0.2, use_layernorm=False)),
    ("4dof", VAEConfig(12, 16, 128, 2, 0.3, use_layernorm=True)),
    ("openlab", VAEConfig(3, 8, 64, 1, 0.2, use_layernorm=True)),
])
def test_vae_presets_shapes(preset, cfg):
    model = vae_from_config(cfg)
    T = {"1dof": 80, "4dof": 100, "openlab": 200}[preset]
    x = jnp.zeros((4, T, cfg.input_dim))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)
    recon, mu, logvar = model.apply(params, x)
    assert recon.shape == (4, T, cfg.input_dim)
    assert mu.shape == logvar.shape == (4, cfg.latent_dim)
    # LayerNorm presence
    has_ln = any("layer_norm" in k for k in params["params"])
    assert has_ln == cfg.use_layernorm


def test_vae_sampling_is_stochastic_and_mean_is_deterministic():
    cfg = VAEConfig(4, 3, 16, 1, 0.0)
    model = vae_from_config(cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 20, 4))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)
    r1, _, _ = model.apply(params, x)
    r2, _, _ = model.apply(params, x)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    s1, _, _ = model.apply(params, x, sample=True, rngs={"reparam": jax.random.PRNGKey(1)})
    s2, _, _ = model.apply(params, x, sample=True, rngs={"reparam": jax.random.PRNGKey(3)})
    assert np.abs(np.asarray(s1) - np.asarray(s2)).max() > 0


def test_vae_loss_matches_torch_formula():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    recon = rng.normal(size=(8, 10, 4)).astype(np.float32)
    x = rng.normal(size=(8, 10, 4)).astype(np.float32)
    mu = rng.normal(size=(8, 3)).astype(np.float32)
    logvar = rng.normal(size=(8, 3)).astype(np.float32)
    total, r, kl = vae_loss(jnp.asarray(recon), jnp.asarray(x),
                            jnp.asarray(mu), jnp.asarray(logvar), 0.37)
    tr = F.mse_loss(torch.tensor(recon), torch.tensor(x), reduction="mean")
    tkl = -0.5 * torch.mean(1 + torch.tensor(logvar) - torch.tensor(mu) ** 2
                            - torch.tensor(logvar).exp())
    assert float(r) == pytest.approx(float(tr), rel=1e-5)
    assert float(kl) == pytest.approx(float(tkl), rel=1e-5)
    assert float(total) == pytest.approx(float(tr) + 0.37 * float(tkl), rel=1e-5)


def test_vae_loss_masked_equals_unpadded():
    rng = np.random.default_rng(1)
    recon = rng.normal(size=(8, 10, 4)).astype(np.float32)
    x = rng.normal(size=(8, 10, 4)).astype(np.float32)
    mu = rng.normal(size=(8, 3)).astype(np.float32)
    logvar = rng.normal(size=(8, 3)).astype(np.float32)
    full = vae_loss(jnp.asarray(recon[:5]), jnp.asarray(x[:5]),
                    jnp.asarray(mu[:5]), jnp.asarray(logvar[:5]), 0.5)
    mask = jnp.asarray([1, 1, 1, 1, 1, 0, 0, 0], jnp.float32)
    masked = vae_loss(jnp.asarray(recon), jnp.asarray(x),
                      jnp.asarray(mu), jnp.asarray(logvar), 0.5, mask=mask)
    for a, b in zip(full, masked):
        assert float(a) == pytest.approx(float(b), rel=1e-5)


def test_cnn4dof_shapes_and_param_count():
    model = CNN4DOF()
    x = jnp.zeros((3, 100, 12, 2))
    vs = model.init({"params": jax.random.PRNGKey(0)}, x)
    logits = model.apply(vs, x, train=False)
    assert logits.shape == (3, 2)
    # torch param count: conv1 2*16*9+16, bn 32, conv2 16*32*9+32, bn 64,
    # fc1 2400*128+128, fc2 128*2+2
    expected = (2 * 16 * 9 + 16) + 2 * 16 + (16 * 32 * 9 + 32) + 2 * 32 \
        + (2400 * 128 + 128) + (128 * 2 + 2)
    assert n_params(vs["params"]) == expected


def test_cnn4dof_batchnorm_updates():
    model = CNN4DOF()
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 100, 12, 2))
    vs = model.init({"params": jax.random.PRNGKey(1)}, x)
    out, mut = model.apply(vs, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
    before = jax.tree.leaves(vs["batch_stats"])
    after = jax.tree.leaves(mut["batch_stats"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
               for a, b in zip(after, before))


def test_cnnopenlab_shapes():
    model = CNNOpenLab()
    x = jnp.zeros((3, 200, 4, 1))
    vs = model.init({"params": jax.random.PRNGKey(0)}, x)
    logits = model.apply(vs, x, train=False)
    assert logits.shape == (3, 2)
    assert "batch_stats" not in vs  # GroupNorm only


def test_cnn_unknown_conv_impl_raises():
    """A typo'd conv_impl must not silently fall back to the slow-compiling
    nn.Conv path."""
    import pytest

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 100, 12, 2))
    with pytest.raises(ValueError, match="conv_impl"):
        CNN4DOF(conv_impl="im2col ").init({"params": jax.random.PRNGKey(0)}, x)
    xo = jax.random.normal(jax.random.PRNGKey(0), (2, 200, 4, 1))
    with pytest.raises(ValueError, match="conv_impl"):
        CNNOpenLab(conv_impl="lax2").init({"params": jax.random.PRNGKey(0)}, xo)


def test_cnn4dof_im2col_matches_lax_conv():
    a = CNN4DOF(conv_impl="im2col")
    b = CNN4DOF(conv_impl="lax")
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 100, 12, 2))
    vs = a.init({"params": jax.random.PRNGKey(0)}, x)
    vs_b = b.init({"params": jax.random.PRNGKey(0)}, x)
    assert (jax.tree_util.tree_structure(vs)
            == jax.tree_util.tree_structure(vs_b))
    la = a.apply(vs, x, train=False)
    lb = b.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               atol=1e-5, rtol=1e-5)


def test_cnnopenlab_im2col_matches_lax_conv():
    """The im2col conv (the shipping default — compiles ~30x faster remotely)
    is functionally identical to nn.Conv: same param tree, same outputs, same
    gradients. Checkpoints are interchangeable."""
    a = CNNOpenLab(conv_impl="im2col")
    b = CNNOpenLab(conv_impl="lax")
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 200, 4, 1))
    vs = a.init({"params": jax.random.PRNGKey(0)}, x)
    vs_b = b.init({"params": jax.random.PRNGKey(0)}, x)
    assert (jax.tree_util.tree_structure(vs)
            == jax.tree_util.tree_structure(vs_b))
    assert ([l.shape for l in jax.tree.leaves(vs)]
            == [l.shape for l in jax.tree.leaves(vs_b)])

    la = a.apply(vs, x, train=False)
    lb = b.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               atol=1e-5, rtol=1e-5)

    def loss(m, v):
        return (m.apply(v, x, train=False) ** 2).sum()

    ga = jax.grad(lambda v: loss(a, v))(vs)
    gb = jax.grad(lambda v: loss(b, v))(vs)
    for pa, pb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=2e-4, rtol=1e-4)
