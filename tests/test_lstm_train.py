"""Custom-VJP fused LSTM training ops: gradient exactness tests.

Pins the Pallas encoder/decoder forwards+backwards (interpret mode on CPU)
against jax.grad of pure-JAX references with identical dropout masks and
reparameterization noise, including the multi-chunk grid (cross-chunk state
carry), and the full VAE glue path against the flax model's own autodiff.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import shm_tpu.ops.lstm_train as lt
from shm_tpu.config import VAEConfig
from shm_tpu.models import vae_from_config
from shm_tpu.models.vae import vae_loss
from shm_tpu.ops.lstm_train import (
    lstm2_enc_last, lstm2_dec_head,
    lstm2_scan_reference, lstm2_dec_head_reference,
    vae_train_forward,
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
    head = [w((5, H)), w((5, 1))]
    din = jnp.asarray(rng.normal(size=(Din, B)).astype(np.float32))
    return xs, dm, ws, din, head


@pytest.fixture(params=["single_chunk", "multi_chunk"])
def chunk_budget(request, monkeypatch):
    if request.param == "multi_chunk":
        # force Tc=4 on the (T=12, H=8, Bt=16) test shapes -> 3 chunks,
        # exercising the cross-chunk state carry in fwd and bwd
        monkeypatch.setattr(lt, "STASH_BLOCK_BUDGET_BYTES", 4 * 4 * 8 * 16 * 4)
    return request.param


def test_enc_forward_matches_reference(scan_setup, chunk_budget):
    xs, dm, ws, _, _ = scan_setup
    ref = lstm2_scan_reference(xs, dm, *ws)[-1]
    out = lstm2_enc_last(xs, dm, *ws, 16, jnp.float32, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_enc_gradients_match_jax_grad(scan_setup, chunk_budget):
    xs, dm, ws, _, _ = scan_setup
    R = jax.random.normal(jax.random.PRNGKey(1), (8, 32))

    def loss_pallas(args):
        xs_, *ws_ = args
        return jnp.sum(lstm2_enc_last(xs_, dm, *ws_, 16, jnp.float32, True) * R)

    def loss_ref(args):
        xs_, *ws_ = args
        return jnp.sum(lstm2_scan_reference(xs_, dm, *ws_)[-1] * R)

    gp = jax.grad(loss_pallas)([xs] + ws)
    gr = jax.grad(loss_ref)([xs] + ws)
    for a, b in zip(gp, gr):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6 * scale)


def test_dec_forward_matches_reference(scan_setup, chunk_budget):
    _, dm, ws, din, head = scan_setup
    T = dm.shape[0]
    ref = lstm2_dec_head_reference(din, dm, *ws, *head, T)
    out = lstm2_dec_head(din, dm, *ws, *head, T, 16, jnp.float32, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_dec_gradients_match_jax_grad(scan_setup, chunk_budget):
    _, dm, ws, din, head = scan_setup
    T = dm.shape[0]
    R = jax.random.normal(jax.random.PRNGKey(2), (T, 5, 32))

    def loss_pallas(args):
        din_, *rest = args
        return jnp.sum(lstm2_dec_head(din_, dm, *rest, T, 16,
                                      jnp.float32, True) * R)

    def loss_ref(args):
        din_, *rest = args
        ws_, head_ = rest[:6], rest[6:]
        return jnp.sum(lstm2_dec_head_reference(din_, dm, *ws_, *head_, T) * R)

    gp = jax.grad(loss_pallas)([din] + ws + head)
    gr = jax.grad(loss_ref)([din] + ws + head)
    for a, b in zip(gp, gr):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6 * scale)


def test_vae_train_forward_grads_match_flax():
    """Glue path (LayerNorm, latent heads, reparam, output head) composes with
    the kernel ops; with eps=0 and unit masks it must equal the flax model's
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
