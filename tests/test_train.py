"""Training-loop tests: losses decrease, best-val selection, early stopping,
KL annealing parity, focal loss parity with the reference formula."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shm_tpu.config import TrainConfig, VAEConfig
from shm_tpu.models import vae_from_config, CNN4DOF
from shm_tpu.train import kl_anneal_sigmoid, train_vae, reconstruction_mse, train_cnn
from shm_tpu.train.cnn import weighted_focal_loss, predict_probs


def test_kl_anneal_matches_reference():
    """Parity with 4DOF/Scripts/03_train_vae.py:120-135."""
    def ref(epoch, n_epochs, ratio=0.3):
        e0 = epoch - 1
        warm = max(1, int(n_epochs * ratio))
        x = (e0 - warm) / float(max(warm, 1))
        return 1.0 / (1.0 + np.exp(-x * 5.0))

    for n in (50, 100, 7):
        for e in range(1, n + 1):
            assert kl_anneal_sigmoid(e, n, 0.3) == pytest.approx(ref(e, n))
    # ramp shape: small early, ~1 late
    assert kl_anneal_sigmoid(1, 50) < 0.01
    assert kl_anneal_sigmoid(50, 50) > 0.99


@pytest.fixture(scope="module")
def sine_windows():
    rng = np.random.default_rng(0)
    t = np.linspace(0, 8 * np.pi, 600)
    X = np.stack([np.sin(t + p) for p in rng.uniform(0, 2 * np.pi, 4)], axis=1)
    X += rng.normal(size=X.shape) * 0.05
    from shm_tpu.data import make_windows
    W = np.asarray(make_windows(jnp.asarray(X.astype(np.float32)), 40, 2))
    return W


def test_train_vae_learns(sine_windows):
    W = sine_windows
    ntr = int(0.7 * len(W))
    cfg = TrainConfig(epochs=12, batch_size=32, lr=3e-3, weight_decay=0.0,
                      grad_clip=2.0, kl_warmup_ratio=0.3, seed=0)
    model = vae_from_config(VAEConfig(4, 4, 24, 1, 0.0, use_layernorm=True))
    res = train_vae(model, W[:ntr], W[ntr:], cfg)
    h = res.history
    assert h["train_recon"][-1] < h["train_recon"][0] * 0.7
    assert res.best_epoch >= 1
    assert np.isfinite(res.best_val)
    # best-val params correspond to the minimum recorded val loss
    assert res.best_val == pytest.approx(min(h["val_total"]))

    scores = reconstruction_mse(model, res.params, W[ntr:], batch_size=64)
    assert scores.shape == (len(W) - ntr,)
    assert np.isfinite(scores).all()
    # anomalous windows (white noise) score higher than in-distribution
    noise = np.random.default_rng(1).normal(size=(20, 40, 4)).astype(np.float32) * 3
    s_noise = reconstruction_mse(model, res.params, noise, batch_size=64)
    assert s_noise.mean() > scores.mean() * 2


def test_train_program_cache_reuse_and_keying(sine_windows):
    """train_vae reuses compiled programs across calls with the same
    configuration (round 4: a multi-seed study no longer recompiles per
    seed). The cache must be keyed so that (a) an identical call is
    bit-identical and adds no entry, (b) a DIFFERENT SEED reuses the same
    programs but produces a different trajectory (the seed flows through
    arguments — a stale-capture bug would return seed-0 results), and
    (c) a different lr misses the cache (lr is baked into the optimizer)."""
    from shm_tpu.config import replace
    from shm_tpu.train.vae import _PROGRAM_CACHE

    W = sine_windows
    ntr = int(0.7 * len(W))
    cfg = TrainConfig(epochs=3, batch_size=32, lr=3e-3, weight_decay=1e-5,
                      grad_clip=2.0, seed=0)
    model = vae_from_config(VAEConfig(4, 4, 24, 1, 0.0, use_layernorm=True))

    _PROGRAM_CACHE.clear()
    r1 = train_vae(model, W[:ntr], W[ntr:], cfg)
    n1 = len(_PROGRAM_CACHE)
    assert n1 == 1

    r2 = train_vae(model, W[:ntr], W[ntr:], cfg)         # identical call
    assert len(_PROGRAM_CACHE) == n1                      # cache hit
    assert r2.history["train_total"] == r1.history["train_total"]
    for a, b in zip(jax.tree.leaves(r1.last_params),
                    jax.tree.leaves(r2.last_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    r3 = train_vae(model, W[:ntr], W[ntr:], replace(cfg, seed=7))
    assert len(_PROGRAM_CACHE) == n1                      # same programs
    assert r3.history["train_total"] != r1.history["train_total"]

    # epochs flow through arguments too: a different epoch count reuses the
    # programs (no new cache entry). The PREFIX-trajectory equality below
    # additionally relies on two properties specific to this E=2-vs-3 pair:
    # threefry's split(root, 2E) is prefix-stable across E, and the KL
    # warm pivot max(1, int(E*0.3)) is 1 for both — for e.g. E=10 vs 50
    # the KL schedule differs from epoch 1 and prefixes would diverge even
    # with a perfectly working cache.
    r4 = train_vae(model, W[:ntr], W[ntr:], replace(cfg, epochs=2))
    assert len(_PROGRAM_CACHE) == n1
    assert r4.history["train_total"] == r1.history["train_total"][:2]

    train_vae(model, W[:ntr], W[ntr:], replace(cfg, lr=1e-3))
    assert len(_PROGRAM_CACHE) == n1 + 1                  # lr is a cache key


def test_cnn_program_cache_reuse_and_keying(cnn_toy_data):
    """Same contract as the VAE cache: identical call bit-identical with no
    new entry; a different seed reuses programs but diverges; different
    sample weights (program CONSTANTS, keyed by value) miss the cache."""
    from shm_tpu.config import replace
    from shm_tpu.train.cnn import _CNN_PROGRAM_CACHE

    X, y = cnn_toy_data
    ntr = int(0.7 * len(X))
    model = CNN4DOF(dropout=0.0)
    cfg = TrainConfig(epochs=2, batch_size=32, lr=1e-3, weight_decay=0.0,
                      grad_clip=2.0, seed=0)

    _CNN_PROGRAM_CACHE.clear()
    r1 = train_cnn(model, X[:ntr], y[:ntr], X[ntr:], y[ntr:], cfg)
    n1 = len(_CNN_PROGRAM_CACHE)
    assert n1 == 1
    r2 = train_cnn(model, X[:ntr], y[:ntr], X[ntr:], y[ntr:], cfg)
    assert len(_CNN_PROGRAM_CACHE) == n1
    assert r2.history["train_loss"] == r1.history["train_loss"]
    r3 = train_cnn(model, X[:ntr], y[:ntr], X[ntr:], y[ntr:],
                   replace(cfg, seed=5))
    assert len(_CNN_PROGRAM_CACHE) == n1
    assert r3.history["train_loss"] != r1.history["train_loss"]
    w = np.ones(ntr)
    w[: ntr // 2] = 3.0
    train_cnn(model, X[:ntr], y[:ntr], X[ntr:], y[ntr:], cfg,
              sample_weights=w)
    assert len(_CNN_PROGRAM_CACHE) == n1 + 1


def test_reconstruction_mse_matches_direct_apply(sine_windows):
    W = sine_windows[:10]
    model = vae_from_config(VAEConfig(4, 4, 24, 1, 0.0))
    params = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(W))["params"]
    s = reconstruction_mse(model, params, W, batch_size=4)  # padded ragged batches
    recon, _, _ = model.apply({"params": params}, jnp.asarray(W))
    expected = np.asarray(((jnp.asarray(W) - recon) ** 2).mean(axis=(1, 2)))
    np.testing.assert_allclose(s, expected, rtol=1e-5)


def test_weighted_focal_loss_matches_reference_formula():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(16, 2)).astype(np.float32)
    labels = rng.integers(0, 2, 16)
    alpha = np.array([0.3, 0.7], np.float32)
    ours = np.asarray(weighted_focal_loss(jnp.asarray(logits),
                                          jnp.asarray(labels), jnp.asarray(alpha), 2.0))
    lt = torch.tensor(logits)
    yt = torch.tensor(labels)
    ce = F.cross_entropy(lt, yt, reduction="none")
    pt = torch.exp(-ce)
    at = torch.tensor(alpha)[yt]
    expected = (at * (1 - pt) ** 2 * ce).numpy()
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


@pytest.fixture(scope="module")
def cnn_toy_data():
    """Separable 2-class windows: class 1 has much larger channel-2 energy."""
    rng = np.random.default_rng(2)
    N = 120
    y = rng.integers(0, 2, N)
    X = rng.normal(size=(N, 100, 12, 2)).astype(np.float32) * 0.3
    X[y == 1, :, :, 1] += 2.0
    return X, y


def test_train_cnn_learns_and_early_stops(cnn_toy_data):
    X, y = cnn_toy_data
    cfg = TrainConfig(epochs=30, batch_size=32, lr=1e-3, weight_decay=0.0,
                      grad_clip=0.0, early_stop_patience=5, seed=0)
    model = CNN4DOF()
    res = train_cnn(model, X[:80], y[:80], X[80:], y[80:], cfg)
    probs = predict_probs(model, res.variables, X[80:], batch_size=32)
    acc = ((probs[:, 1] > 0.5).astype(int) == y[80:]).mean()
    assert acc > 0.9
    assert res.best_epoch >= 1
    assert res.stopped_epoch <= cfg.epochs


def test_train_cnn_weighted_sampling_and_focal(cnn_toy_data):
    X, y = cnn_toy_data
    cfg = TrainConfig(epochs=8, batch_size=32, lr=1e-3, weight_decay=1e-4,
                      grad_clip=2.0, decoupled_wd=True, seed=0)
    model = CNN4DOF()
    counts = np.bincount(y[:80], minlength=2)
    alpha = counts.sum() / (2.0 * counts)
    sw = alpha[y[:80]]
    res = train_cnn(model, X[:80], y[:80], X[80:], y[80:], cfg,
                    loss="focal", focal_gamma=2.0, class_alpha=alpha,
                    sample_weights=sw)
    assert np.isfinite(res.history["train_loss"]).all()
    assert res.history["train_loss"][-1] < res.history["train_loss"][0]


def test_train_cnn_fused_epoch_matches_loop(cnn_toy_data):
    """The one-dispatch-per-epoch program runs the same math in the same
    order as the per-batch loop (same key derivation / batch order).

    With lr=0 the two paths must agree tightly (pure program equivalence:
    forward, loss masking, BatchNorm stats — no optimizer state evolves).
    With lr>0, last-bit XLA fusion rounding amplifies chaotically through
    Adam, so only behavioral equivalence is asserted there."""
    from shm_tpu.config import TrainConfig
    from shm_tpu.models import CNN4DOF

    X, y = cnn_toy_data
    model = CNN4DOF(dropout=0.3)
    cfg0 = TrainConfig(epochs=2, batch_size=32, lr=0.0, weight_decay=5e-5,
                       grad_clip=2.0, seed=0, early_stop_patience=10)
    loop = train_cnn(model, X[:80], y[:80], X[80:], y[80:], cfg0,
                     fused_epoch=False)
    fused = train_cnn(model, X[:80], y[:80], X[80:], y[80:], cfg0,
                      fused_epoch=True)
    np.testing.assert_allclose(loop.history["train_loss"],
                               fused.history["train_loss"], rtol=1e-6)
    np.testing.assert_allclose(loop.history["val_loss"],
                               fused.history["val_loss"], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(loop.variables),
                    jax.tree.leaves(fused.variables)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    cfg3 = TrainConfig(epochs=3, batch_size=32, lr=1e-3, weight_decay=5e-5,
                       grad_clip=2.0, seed=0, early_stop_patience=10)
    f3 = train_cnn(model, X[:80], y[:80], X[80:], y[80:], cfg3,
                   fused_epoch=True)
    assert np.isfinite(f3.history["train_loss"]).all()
    assert f3.history["train_loss"][-1] < f3.history["train_loss"][0]
