"""Fused hybrid pipeline tests: routing semantics, batching, sharded execution."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shm_tpu.config import VAEConfig
from shm_tpu.models import vae_from_config, CNN4DOF
from shm_tpu.pipeline import make_hybrid_fn, run_hybrid_batched
from shm_tpu.parallel import make_mesh, make_dp_hybrid_fn, make_dp_vae_train_step, replicate, shard_batch
from shm_tpu.train.vae import make_optimizer
from shm_tpu.config import TrainConfig


@pytest.fixture(scope="module")
def tiny_models():
    vae = vae_from_config(VAEConfig(12, 4, 16, 1, 0.0, use_layernorm=True))
    cnn = CNN4DOF()
    W = jax.random.normal(jax.random.PRNGKey(0), (16, 100, 12))
    vae_params = vae.init({"params": jax.random.PRNGKey(1)}, W)["params"]
    cnn_vars = cnn.init({"params": jax.random.PRNGKey(2)},
                        jnp.zeros((2, 100, 12, 2)))
    return vae, cnn, vae_params, cnn_vars


def test_hybrid_routing_semantics(tiny_models):
    vae, cnn, vp, cv = tiny_models
    W = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (32, 100, 12)))
    mean = np.zeros(12, np.float32)
    std = np.ones(12, np.float32)
    fn = make_hybrid_fn(vae, cnn)

    out = fn(vp, cv, jnp.asarray(W), jnp.asarray(mean), jnp.asarray(std),
             jnp.float32(1e9))
    # threshold above everything: all windows Normal (0), p_struct 0
    assert (np.asarray(out.y_pred) == 0).all()
    assert (np.asarray(out.p_struct) == 0).all()
    assert not np.asarray(out.anomalous).any()

    out = fn(vp, cv, jnp.asarray(W), jnp.asarray(mean), jnp.asarray(std),
             jnp.float32(-1.0))
    # threshold below everything: every window routed; predictions in {1, 2}
    yp = np.asarray(out.y_pred)
    assert set(np.unique(yp)).issubset({1, 2})
    # p_struct equals softmax[:, 1] of the logits
    probs = np.asarray(jax.nn.softmax(out.logits, axis=1))[:, 1]
    np.testing.assert_allclose(np.asarray(out.p_struct), probs, rtol=1e-6)
    # argmax+1 mapping
    np.testing.assert_array_equal(yp, np.argmax(np.asarray(out.logits), 1) + 1)

    # strict > gate: a window exactly at threshold is NOT anomalous
    mse0 = float(np.asarray(out.mse)[0])
    out2 = fn(vp, cv, jnp.asarray(W), jnp.asarray(mean), jnp.asarray(std),
              jnp.float32(mse0))
    assert not bool(np.asarray(out2.anomalous)[0])


def test_run_hybrid_batched_padding(tiny_models):
    vae, cnn, vp, cv = tiny_models
    W = np.asarray(jax.random.normal(jax.random.PRNGKey(4), (23, 100, 12)),
                   np.float32)
    mean = np.zeros(12, np.float32)
    std = np.ones(12, np.float32)
    fn = make_hybrid_fn(vae, cnn)
    full = fn(vp, cv, jnp.asarray(W), jnp.asarray(mean), jnp.asarray(std),
              jnp.float32(0.5))
    batched = run_hybrid_batched(fn, vp, cv, W, mean, std, 0.5, batch_size=8)
    np.testing.assert_allclose(batched["mse"], np.asarray(full.mse), rtol=1e-5)
    np.testing.assert_array_equal(batched["y_pred"], np.asarray(full.y_pred))


def test_dp_hybrid_matches_single_device(tiny_models):
    vae, cnn, vp, cv = tiny_models
    mesh = make_mesh(8)
    W = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (64, 100, 12)),
                   np.float32)
    mean = np.zeros(12, np.float32)
    std = np.ones(12, np.float32)
    fn = make_hybrid_fn(vae, cnn)
    single = fn(vp, cv, jnp.asarray(W), jnp.asarray(mean), jnp.asarray(std),
                jnp.float32(0.5))
    dp = make_dp_hybrid_fn(fn, mesh)
    sharded = dp(vp, cv, W, mean, std, jnp.float32(0.5))
    np.testing.assert_allclose(np.asarray(sharded.mse), np.asarray(single.mse),
                               rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(sharded.y_pred),
                                  np.asarray(single.y_pred))


def test_dp_vae_train_step_runs_and_improves():
    mesh = make_mesh(8)
    vae = vae_from_config(VAEConfig(4, 3, 16, 1, 0.0, use_layernorm=True))
    W = jax.random.normal(jax.random.PRNGKey(0), (64, 20, 4))
    params = vae.init({"params": jax.random.PRNGKey(1)}, W)["params"]
    cfg = TrainConfig(epochs=1, batch_size=64, lr=1e-2, weight_decay=0.0,
                      grad_clip=2.0)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    Wd = shard_batch(np.asarray(W), mesh)
    step = make_dp_vae_train_step(vae, tx, mesh)
    losses = []
    for i in range(10):
        params, opt_state, loss = step(params, opt_state, Wd,
                                       jax.random.PRNGKey(i), jnp.float32(0.1))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
