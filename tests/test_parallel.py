"""Multi-device tests beyond test_pipeline: shard_map hybrid (XLA and fused
Pallas inner), replication helpers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shm_tpu.config import VAEConfig
from shm_tpu.models import vae_from_config, CNN4DOF
from shm_tpu.parallel import make_mesh, make_dp_hybrid_shardmap, replicate
from shm_tpu.pipeline import make_hybrid_fn


@pytest.fixture(scope="module")
def setup():
    vae = vae_from_config(VAEConfig(12, 4, 16, 2, 0.0, use_layernorm=True))
    cnn = CNN4DOF()
    key = jax.random.PRNGKey(0)
    W = jax.random.normal(key, (64, 100, 12))
    vp = vae.init({"params": key}, W[:2])["params"]
    cv = cnn.init({"params": key}, jnp.zeros((2, 100, 12, 2)))
    mean, std = jnp.zeros(12), jnp.ones(12)
    thr = jnp.float32(0.5)
    single = make_hybrid_fn(vae, cnn)(vp, cv, W, mean, std, thr)
    return vae, cnn, vp, cv, W, mean, std, thr, single


def test_shardmap_hybrid_xla_inner(setup):
    vae, cnn, vp, cv, W, mean, std, thr, single = setup
    mesh = make_mesh(8)
    fn = make_dp_hybrid_shardmap(vae, cnn, mesh)
    out = fn(vp, cv, W, mean, std, thr)
    np.testing.assert_allclose(np.asarray(out.mse), np.asarray(single.mse),
                               rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(out.y_pred),
                                  np.asarray(single.y_pred))


def test_shardmap_hybrid_fused_pallas_inner(setup):
    """The Pallas kernel runs per-device inside shard_map (interpret on CPU)."""
    vae, cnn, vp, cv, W, mean, std, thr, single = setup
    mesh = make_mesh(8)
    fn = make_dp_hybrid_shardmap(vae, cnn, mesh, use_fused_vae=True,
                                 fused_dtype=jnp.float32, fused_interpret=True)
    out = fn(vp, cv, W, mean, std, thr)
    np.testing.assert_allclose(np.asarray(out.mse), np.asarray(single.mse),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out.y_pred),
                                  np.asarray(single.y_pred))


def test_replicate_places_on_all_devices(setup):
    vae, cnn, vp, *_ = setup
    mesh = make_mesh(8)
    rp = replicate(vp, mesh)
    leaf = jax.tree.leaves(rp)[0]
    assert len(leaf.sharding.device_set) == 8


def test_dp_cnn_train_step_runs_and_improves():
    from shm_tpu.config import TrainConfig
    from shm_tpu.parallel import make_dp_cnn_train_step, make_mesh, replicate, shard_batch
    from shm_tpu.train.vae import make_optimizer

    mesh = make_mesh(8)
    cnn = CNN4DOF()
    rng = np.random.default_rng(0)
    X = rng.normal(size=(64, 100, 12, 2)).astype(np.float32) * 0.3
    y = rng.integers(0, 2, 64).astype(np.int32)
    X[y == 1, :, :, 1] += 2.0
    variables = cnn.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(X[:2]),
                         train=False)
    tx = make_optimizer(TrainConfig(batch_size=64, lr=1e-3, weight_decay=0.0,
                                    grad_clip=0.0))
    params = replicate(variables["params"], mesh)
    bst = replicate(variables["batch_stats"], mesh)
    opt_state = replicate(tx.init(variables["params"]), mesh)
    Xd, yd = shard_batch(X, mesh), shard_batch(y, mesh)
    step = make_dp_cnn_train_step(cnn, tx, mesh)
    losses = []
    for i in range(8):
        params, bst, opt_state, l = step(params, bst, opt_state, Xd, yd,
                                         jax.random.PRNGKey(i))
        losses.append(float(l))
    assert losses[-1] < losses[0]
