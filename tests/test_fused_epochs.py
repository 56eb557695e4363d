"""Fused-epochs training path produces bit-identical results to the epoch loop."""

import numpy as np
import jax
import jax.numpy as jnp

from shm_tpu.config import TrainConfig, VAEConfig
from shm_tpu.models import vae_from_config
from shm_tpu.train import train_vae


def test_fused_epochs_matches_loop():
    rng = np.random.default_rng(0)
    t = np.linspace(0, 8 * np.pi, 400)
    X = np.stack([np.sin(t + p) for p in rng.uniform(0, 2 * np.pi, 4)], axis=1)
    from shm_tpu.data import make_windows
    W = np.asarray(make_windows(jnp.asarray(X.astype(np.float32)), 30, 2))

    model = vae_from_config(VAEConfig(4, 3, 16, 1, 0.0))
    cfg = TrainConfig(epochs=5, batch_size=32, lr=1e-3, weight_decay=1e-5,
                      grad_clip=2.0, seed=0)
    loop = train_vae(model, W, W[:32], cfg, fused_epochs=False)
    fused = train_vae(model, W, W[:32], cfg, fused_epochs=True)

    # exact equality — the docstring claims bit-identity, so the test must
    # be able to detect a ~1e-8 reassociation drift, not absorb it
    np.testing.assert_array_equal(loop.history["train_total"],
                                  fused.history["train_total"])
    np.testing.assert_array_equal(loop.history["val_total"],
                                  fused.history["val_total"])
    assert loop.best_epoch == fused.best_epoch
    for a, b in zip(jax.tree.leaves(loop.params), jax.tree.leaves(fused.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_epoch_chunks_bit_identical_to_whole_run():
    """epoch_chunk=K (one K-epoch program dispatched E/K times, device-resident
    carry) must be BIT-identical to the whole-run program — including a ragged
    final chunk and the on-device best-val selection."""
    rng = np.random.default_rng(2)
    t = np.linspace(0, 8 * np.pi, 400)
    X = np.stack([np.sin(t + p) for p in rng.uniform(0, 2 * np.pi, 4)], axis=1)
    from shm_tpu.data import make_windows
    W = np.asarray(make_windows(jnp.asarray(X.astype(np.float32)), 30, 2))

    model = vae_from_config(VAEConfig(4, 3, 16, 1, 0.0))
    cfg = TrainConfig(epochs=5, batch_size=32, lr=1e-3, weight_decay=1e-5,
                      grad_clip=2.0, seed=0)
    whole = train_vae(model, W, W[:32], cfg, fused_epochs=True)
    for k in (1, 2, 5):          # 2 -> ragged final chunk (5 = 2+2+1)
        chunked = train_vae(model, W, W[:32], cfg, fused_epochs=True,
                            epoch_chunk=k)
        np.testing.assert_array_equal(whole.history["train_total"],
                                      chunked.history["train_total"])
        np.testing.assert_array_equal(whole.history["val_total"],
                                      chunked.history["val_total"])
        assert chunked.best_epoch == whole.best_epoch
        assert chunked.best_val == whole.best_val
        for a, b in zip(jax.tree.leaves(whole.params),
                        jax.tree.leaves(chunked.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_epochs_matches_loop_pallas_kernel():
    """The Pallas training-kernel path must be bit-identical between the
    per-batch loop and the fused whole-run program (same RNG derivation)."""
    rng = np.random.default_rng(1)
    t = np.linspace(0, 8 * np.pi, 300)
    X = np.stack([np.sin(t + p) for p in rng.uniform(0, 2 * np.pi, 4)], axis=1)
    from shm_tpu.data import make_windows
    W = np.asarray(make_windows(jnp.asarray(X.astype(np.float32)), 20, 4))

    model = vae_from_config(VAEConfig(4, 3, 8, 2, 0.2, use_layernorm=True))
    cfg = TrainConfig(epochs=3, batch_size=16, lr=1e-3, weight_decay=1e-5,
                      grad_clip=2.0, seed=0)
    kw = dict(use_pallas_kernel=True, kernel_dtype=jnp.float32,
              kernel_interpret=True)
    loop = train_vae(model, W, W[:16], cfg, fused_epochs=False, **kw)
    fused = train_vae(model, W, W[:16], cfg, fused_epochs=True, **kw)

    np.testing.assert_allclose(loop.history["train_total"],
                               fused.history["train_total"], rtol=1e-6)
    np.testing.assert_allclose(loop.history["val_total"],
                               fused.history["val_total"], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(loop.params), jax.tree.leaves(fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
