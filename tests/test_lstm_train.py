"""Custom-VJP fused LSTM training kernel: gradient exactness tests.

Pins the Pallas forward+backward (interpret mode on CPU) against jax.grad of a
pure-JAX reference with identical dropout masks and reparameterization noise,
and the full VAE glue path against the flax model's own autodiff.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shm_tpu.config import VAEConfig
from shm_tpu.models import vae_from_config
from shm_tpu.models.vae import vae_loss
from shm_tpu.ops.lstm_train import (
    lstm2_scan, lstm2_scan_reference, vae_train_forward,
)


@pytest.fixture(scope="module")
def scan_setup():
    rng = np.random.default_rng(0)
    T, Din, B, H = 12, 6, 32, 8
    xs = jnp.asarray(rng.normal(size=(T, Din, B)).astype(np.float32))
    dm = jnp.asarray((rng.random((T, H, B)) > 0.3).astype(np.float32) / 0.7)
    w = lambda shape: jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.3)
    ws = [w((4 * H, Din)), w((4 * H, H)), w((4 * H, 1)),
          w((4 * H, H)), w((4 * H, H)), w((4 * H, 1))]
    return xs, dm, ws


def test_lstm2_scan_forward_matches_reference(scan_setup):
    xs, dm, ws = scan_setup
    ref = lstm2_scan_reference(xs, dm, *ws)
    out = lstm2_scan(xs, dm, *ws, batch_tile=16, dtype=jnp.float32,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_lstm2_scan_gradients_match_jax_grad(scan_setup):
    xs, dm, ws = scan_setup
    R = jax.random.normal(jax.random.PRNGKey(1), (12, 8, 32))

    def loss_pallas(args):
        xs_, *ws_ = args
        return jnp.sum(lstm2_scan(xs_, dm, *ws_, batch_tile=16,
                                  dtype=jnp.float32, interpret=True) * R)

    def loss_ref(args):
        xs_, *ws_ = args
        return jnp.sum(lstm2_scan_reference(xs_, dm, *ws_) * R)

    gp = jax.grad(loss_pallas)([xs] + ws)
    gr = jax.grad(loss_ref)([xs] + ws)
    for a, b in zip(gp, gr):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6 * scale)


def test_vae_train_forward_grads_match_flax():
    """Glue path (LayerNorm, latent heads, reparam, output head) composes with
    the kernel op; with eps=0 and unit masks it must equal the flax model's
    autodiff exactly."""
    cfg = VAEConfig(12, 16, 128, 2, 0.3, use_layernorm=True)
    model = vae_from_config(cfg)
    rng = np.random.default_rng(0)
    B, T, D, H, Zd = 16, 10, 12, 128, 16
    Z = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0)}, Z[:2])["params"]
    ones = jnp.ones((T, H, B))
    eps0 = jnp.zeros((B, Zd))

    def loss_glue(p):
        recon, mu, lv = vae_train_forward(p, Z, eps0, ones, ones,
                                          use_pallas=False)
        return vae_loss(recon, Z, mu, lv, 0.5)[0]

    def loss_flax(p):
        recon, mu, lv = model.apply({"params": p}, Z, sample=False)
        return vae_loss(recon, Z, mu, lv, 0.5)[0]

    ga = jax.grad(loss_glue)(params)
    gb = jax.grad(loss_flax)(params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_vae_train_forward_pallas_equals_reference_path():
    cfg = VAEConfig(4, 3, 16, 2, 0.25, use_layernorm=True)
    model = vae_from_config(cfg)
    rng = np.random.default_rng(1)
    B, T, D, H, Zd = 16, 8, 4, 16, 3
    Z = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0)}, Z[:2])["params"]
    eps = jnp.asarray(rng.normal(size=(B, Zd)).astype(np.float32))
    dm_e = jnp.asarray((rng.random((T, H, B)) > 0.25).astype(np.float32) / 0.75)
    dm_d = jnp.asarray((rng.random((T, H, B)) > 0.25).astype(np.float32) / 0.75)

    def loss(p, use_pallas):
        recon, mu, lv = vae_train_forward(
            p, Z, eps, dm_e, dm_d, batch_tile=16, dtype=jnp.float32,
            interpret=True, use_pallas=use_pallas)
        return vae_loss(recon, Z, mu, lv, 0.3)[0]

    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(p, False))(params)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)
