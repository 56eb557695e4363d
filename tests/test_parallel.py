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


def test_shardmap_hybrid_fused_attention_inner():
    """Multi-chip serving of the attention family: auto_fused_gate now routes
    cell="attention" through its head-packed kernel on TPU, and mesh-backed
    scorers wrap the SAME make_hybrid_fn in shard_map — so the kernel must
    run per-device inside shard_map too (interpret on CPU; kernel-supported
    width hidden_dim=32)."""
    vae = vae_from_config(VAEConfig(12, 4, 32, 1, 0.0, use_layernorm=True,
                                    cell="attention"))
    cnn = CNN4DOF()
    key = jax.random.PRNGKey(0)
    W = jax.random.normal(key, (64, 100, 12))
    vp = vae.init({"params": key}, W[:2])["params"]
    cv = cnn.init({"params": key}, jnp.zeros((2, 100, 12, 2)))
    mean, std = jnp.zeros(12), jnp.ones(12)
    thr = jnp.float32(0.5)
    single = make_hybrid_fn(vae, cnn)(vp, cv, W, mean, std, thr)
    mesh = make_mesh(8)
    fn = make_dp_hybrid_shardmap(vae, cnn, mesh, use_fused_vae=True,
                                 fused_dtype=jnp.float32, fused_interpret=True)
    out = fn(vp, cv, W, mean, std, thr)
    np.testing.assert_allclose(np.asarray(out.mse), np.asarray(single.mse),
                               atol=2e-5, rtol=2e-4)
    np.testing.assert_array_equal(np.asarray(out.y_pred),
                                  np.asarray(single.y_pred))


def test_make_mesh_rejects_overrequest():
    """Requesting more devices than exist must raise, not silently truncate —
    `--devices 8` on a 1-chip host would otherwise train single-device while
    the user believes they measured 8-way DP."""
    n = len(jax.devices())
    with pytest.raises(ValueError, match="available"):
        make_mesh(n + 1)


def test_replicate_places_on_all_devices(setup):
    vae, cnn, vp, *_ = setup
    mesh = make_mesh(8)
    rp = replicate(vp, mesh)
    leaf = jax.tree.leaves(rp)[0]
    assert len(leaf.sharding.device_set) == 8


class TestMeshTraining:
    """train_vae/train_cnn with mesh=: the user-reachable DP training path.

    The mesh run executes the SAME program as single-device (global batches,
    one RNG stream) with the minibatch sharded over 8 virtual devices —
    trajectories must agree to float-reduction-order tolerance, for BOTH
    execution structures (per-batch loop and fused whole-run scan)."""

    def _vae_data(self):
        from shm_tpu.config import VAEConfig

        vae = vae_from_config(VAEConfig(4, 3, 8, 2, 0.2, use_layernorm=True))
        key = jax.random.PRNGKey(42)
        Ztr = jax.random.normal(key, (48, 16, 4))
        Zva = jax.random.normal(jax.random.fold_in(key, 1), (24, 16, 4))
        return vae, np.asarray(Ztr), np.asarray(Zva)

    @pytest.mark.parametrize("fused", [False, True])
    def test_train_vae_mesh_matches_single_device(self, fused):
        from shm_tpu.config import TrainConfig
        from shm_tpu.train.vae import train_vae

        vae, Ztr, Zva = self._vae_data()
        cfg = TrainConfig(epochs=3, batch_size=16, lr=1e-3, weight_decay=1e-5,
                          grad_clip=2.0, seed=0)
        ref = train_vae(vae, Ztr, Zva, cfg, fused_epochs=fused)
        got = train_vae(vae, Ztr, Zva, cfg, fused_epochs=fused,
                        mesh=make_mesh(8))
        np.testing.assert_allclose(got.history["train_total"],
                                   ref.history["train_total"], rtol=1e-5)
        np.testing.assert_allclose(got.history["val_total"],
                                   ref.history["val_total"], rtol=1e-5)
        assert got.best_epoch == ref.best_epoch
        for a, b in zip(jax.tree.leaves(got.params), jax.tree.leaves(ref.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_train_vae_mesh_mingru(self):
        """The min_gru preset data-parallelizes through the same GSPMD path
        (pure XLA forward — nothing LSTM-specific in the mesh wiring)."""
        from shm_tpu.config import TrainConfig, VAEConfig
        from shm_tpu.train.vae import train_vae

        vae = vae_from_config(VAEConfig(4, 3, 8, 2, 0.2, use_layernorm=True,
                                        cell="min_gru"))
        key = jax.random.PRNGKey(7)
        Ztr = np.asarray(jax.random.normal(key, (48, 16, 4)))
        Zva = np.asarray(jax.random.normal(jax.random.fold_in(key, 1),
                                           (24, 16, 4)))
        cfg = TrainConfig(epochs=2, batch_size=16, lr=1e-3, seed=0)
        ref = train_vae(vae, Ztr, Zva, cfg, fused_epochs=False)
        got = train_vae(vae, Ztr, Zva, cfg, fused_epochs=False,
                        mesh=make_mesh(8))
        np.testing.assert_allclose(got.history["train_total"],
                                   ref.history["train_total"], rtol=1e-5)
        assert got.best_epoch == ref.best_epoch

    def test_train_vae_mesh_rejects_pallas_kernel(self):
        from shm_tpu.config import TrainConfig
        from shm_tpu.train.vae import train_vae

        vae, Ztr, Zva = self._vae_data()
        with pytest.raises(ValueError, match="mesh"):
            train_vae(vae, Ztr, Zva, TrainConfig(epochs=1, batch_size=16),
                      mesh=make_mesh(8), use_pallas_kernel=True)

    @pytest.mark.parametrize("fused", [False, True])
    def test_train_cnn_mesh_matches_single_device(self, fused):
        from shm_tpu.config import TrainConfig
        from shm_tpu.train.cnn import train_cnn

        cnn = CNN4DOF(dropout=0.5)
        rng = np.random.default_rng(0)
        X = rng.normal(size=(48, 100, 12, 2)).astype(np.float32) * 0.3
        y = rng.integers(0, 2, 48).astype(np.int32)
        X[y == 1, :, :, 1] += 1.5
        Xva = X[:16].copy()
        yva = y[:16].copy()
        cfg = TrainConfig(epochs=2, batch_size=16, lr=1e-3, weight_decay=5e-5,
                          grad_clip=0.0, seed=1)
        # single-step agreement is tight (one global batch, one update):
        # only float reduction order differs
        one = TrainConfig(epochs=1, batch_size=48, lr=1e-3, weight_decay=5e-5,
                          grad_clip=0.0, seed=1)
        r1 = train_cnn(cnn, X, y, Xva, yva, one, fused_epoch=fused)
        g1 = train_cnn(cnn, X, y, Xva, yva, one, fused_epoch=fused,
                       mesh=make_mesh(8))
        np.testing.assert_allclose(g1.history["train_loss"],
                                   r1.history["train_loss"], rtol=1e-5)
        # BatchNorm running stats after one step: computed over the GLOBAL
        # sharded batch, so they match single-device tightly
        for a, b in zip(jax.tree.leaves(g1.variables["batch_stats"]),
                        jax.tree.leaves(r1.variables["batch_stats"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
        # multi-epoch trajectories: reduction-order noise crosses ReLU/
        # maxpool/BatchNorm decision boundaries and compounds per step —
        # documented tolerance, same convergence
        ref = train_cnn(cnn, X, y, Xva, yva, cfg, fused_epoch=fused)
        got = train_cnn(cnn, X, y, Xva, yva, cfg, fused_epoch=fused,
                        mesh=make_mesh(8))
        np.testing.assert_allclose(got.history["train_loss"],
                                   ref.history["train_loss"], rtol=1e-2)
        np.testing.assert_allclose(got.history["val_loss"],
                                   ref.history["val_loss"], rtol=1e-2)


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
