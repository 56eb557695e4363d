"""Checkpoint/resume and profiling-utility tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shm_tpu.config import TrainConfig, VAEConfig
from shm_tpu.models import vae_from_config
from shm_tpu.train import train_vae
from shm_tpu.utils.checkpoint import save_params, load_params
from shm_tpu.utils.profiling import Timer, throughput


@pytest.fixture(scope="module")
def windows():
    rng = np.random.default_rng(0)
    t = np.linspace(0, 8 * np.pi, 400)
    X = np.stack([np.sin(t + p) for p in rng.uniform(0, 2 * np.pi, 4)], axis=1)
    from shm_tpu.data import make_windows
    return np.asarray(make_windows(jnp.asarray(X.astype(np.float32)), 30, 2))


def test_params_checkpoint_roundtrip(tmp_path, windows):
    model = vae_from_config(VAEConfig(4, 3, 16, 1, 0.0))
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(windows[:2]))["params"]
    save_params({"params": params}, tmp_path / "m.msgpack")
    template = model.init({"params": jax.random.PRNGKey(1)},
                          jnp.asarray(windows[:2]))
    restored = load_params({"params": template["params"]}, tmp_path / "m.msgpack")
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_resume_is_exact(tmp_path, windows, capsys):
    """Interrupted-then-resumed training produces the identical result as an
    uninterrupted run (full state incl. optimizer moments and PRNG persists)."""
    model = vae_from_config(VAEConfig(4, 3, 16, 1, 0.0))
    W = windows
    cfg = TrainConfig(epochs=6, batch_size=32, lr=1e-3, weight_decay=1e-5,
                      grad_clip=2.0, seed=0)

    full = train_vae(model, W, W[:32], cfg)

    d1 = tmp_path / "ck"
    # phase 1: run only 3 epochs (simulated interruption) — wanted solely
    # for its checkpoint side effect
    train_vae(model, W, W[:32],
              TrainConfig(epochs=3, batch_size=32, lr=1e-3,
                          weight_decay=1e-5, grad_clip=2.0, seed=0),
              checkpoint_dir=str(d1), checkpoint_every=1)
    # phase 2: resume to epoch 6
    capsys.readouterr()
    res = train_vae(model, W, W[:32], cfg, checkpoint_dir=str(d1),
                    checkpoint_every=1, resume=True)

    # the equality asserts below CANNOT distinguish a working resume from a
    # silent fresh restart (training is seed-deterministic, so both produce
    # the identical result) — assert the restore actually happened
    assert "[resume] restored epoch 3" in capsys.readouterr().out

    assert res.history["epoch"] == full.history["epoch"]
    np.testing.assert_allclose(res.history["train_total"],
                               full.history["train_total"], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(full.last_params),
                    jax.tree.leaves(res.last_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_fused_checkpoint_resume_matches_loop(tmp_path, windows, capsys):
    """Checkpointing at fused-chunk boundaries: ``fused_epochs=True`` +
    ``checkpoint_dir`` keeps fused-path speed while persisting full state.
    The checkpoint format is path-agnostic — here a LOOP-written checkpoint
    resumes on the FUSED path onto the identical trajectory — and a resume
    of an already-complete checkpoint returns the recorded result without
    running any epochs."""
    model = vae_from_config(VAEConfig(4, 3, 16, 1, 0.0))
    W = windows
    cfg6 = TrainConfig(epochs=6, batch_size=32, lr=1e-3, weight_decay=1e-5,
                       grad_clip=2.0, seed=0)
    full = train_vae(model, W, W[:32], cfg6)   # uninterrupted loop run

    # phase 1: LOOP-path run to epoch 4 (simulated interruption), saving every 2
    d = tmp_path / "ck"
    train_vae(model, W, W[:32],
              TrainConfig(epochs=4, batch_size=32, lr=1e-3, weight_decay=1e-5,
                          grad_clip=2.0, seed=0),
              checkpoint_dir=str(d), checkpoint_every=2)
    # phase 2: resume on the FUSED path to epoch 6 (chunk = checkpoint_every)
    capsys.readouterr()
    res = train_vae(model, W, W[:32], cfg6, checkpoint_dir=str(d),
                    checkpoint_every=2, resume=True, fused_epochs=True)
    assert "[resume] restored epoch 4" in capsys.readouterr().out
    assert res.history["epoch"] == full.history["epoch"]
    for col in ("kl_w", "train_total", "train_recon", "train_kl",
                "val_total", "val_recon", "val_kl"):
        np.testing.assert_allclose(res.history[col], full.history[col],
                                   rtol=1e-6, err_msg=col)
    assert res.best_epoch == full.best_epoch
    np.testing.assert_allclose(res.best_val, full.best_val, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(full.last_params),
                    jax.tree.leaves(res.last_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # phase 2 checkpointed at its final chunk boundary (epoch 6): resuming the
    # COMPLETE run must restore the recorded result and run zero epochs
    capsys.readouterr()
    res2 = train_vae(model, W, W[:32], cfg6, checkpoint_dir=str(d),
                     checkpoint_every=2, resume=True, fused_epochs=True)
    assert "[resume] restored epoch 6" in capsys.readouterr().out
    assert res2.history["epoch"] == full.history["epoch"]
    assert res2.best_epoch == full.best_epoch
    for a, b in zip(jax.tree.leaves(res.last_params),
                    jax.tree.leaves(res2.last_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loop_resume_of_fused_checkpoint_matches_loop(tmp_path, windows,
                                                     capsys):
    """The other direction of path-agnosticism, with REAL epochs both sides:
    a FUSED-path run interrupted at epoch 4 writes a checkpoint that a
    LOOP-path (``fused_epochs=False``) resume continues onto the identical
    trajectory of an uninterrupted loop run (ADVICE r3: this direction was
    previously only exercised with a zero-epoch second resume)."""
    model = vae_from_config(VAEConfig(4, 3, 16, 1, 0.0))
    W = windows
    cfg6 = TrainConfig(epochs=6, batch_size=32, lr=1e-3, weight_decay=1e-5,
                       grad_clip=2.0, seed=0)
    full = train_vae(model, W, W[:32], cfg6)   # uninterrupted loop run

    # phase 1: FUSED-path run to epoch 4 (simulated interruption), saving
    # at every 2-epoch chunk boundary
    d = tmp_path / "ck"
    train_vae(model, W, W[:32],
              TrainConfig(epochs=4, batch_size=32, lr=1e-3, weight_decay=1e-5,
                          grad_clip=2.0, seed=0),
              checkpoint_dir=str(d), checkpoint_every=2, fused_epochs=True)
    # phase 2: resume the fused-written checkpoint on the LOOP path
    capsys.readouterr()
    res = train_vae(model, W, W[:32], cfg6, checkpoint_dir=str(d),
                    checkpoint_every=2, resume=True, fused_epochs=False)
    assert "[resume] restored epoch 4" in capsys.readouterr().out
    assert res.history["epoch"] == full.history["epoch"]
    for col in ("kl_w", "train_total", "train_recon", "train_kl",
                "val_total", "val_recon", "val_kl"):
        np.testing.assert_allclose(res.history[col], full.history[col],
                                   rtol=1e-6, err_msg=col)
    assert res.best_epoch == full.best_epoch
    np.testing.assert_allclose(res.best_val, full.best_val, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(full.last_params),
                    jax.tree.leaves(res.last_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_elastic_resume_across_mesh_sizes(tmp_path, windows, capsys):
    """Elastic recovery (VERDICT r4 #6): a checkpoint written by an
    8-device data-parallel run resumes at 4 devices AND at single-device
    onto the trajectory of an UNINTERRUPTED single-device run.

    This works by construction — the checkpoint stores the full replicated
    state device-agnostically, the key schedule re-derives from cfg.seed,
    and the global batch plan is mesh-size-independent (DP shards each
    minibatch, it never changes batch order) — so the only difference is
    float reduction order, the same tolerance test_parallel.py pins for
    mesh-vs-single training."""
    import shutil

    from shm_tpu.parallel import make_mesh

    model = vae_from_config(VAEConfig(4, 3, 16, 1, 0.0))
    W = windows
    cfg6 = TrainConfig(epochs=6, batch_size=32, lr=1e-3, weight_decay=1e-5,
                       grad_clip=2.0, seed=0)
    full = train_vae(model, W, W[:32], cfg6)   # uninterrupted single-device

    # phase 1: 8-device DP run interrupted at epoch 3, checkpointing each epoch
    d8 = tmp_path / "ck8"
    train_vae(model, W, W[:32],
              TrainConfig(epochs=3, batch_size=32, lr=1e-3, weight_decay=1e-5,
                          grad_clip=2.0, seed=0),
              checkpoint_dir=str(d8), checkpoint_every=1, mesh=make_mesh(8))

    # phase 2: resume the SAME epoch-3 state at 4 devices and at 1 device
    # (fresh copy per target — a completed resume rewrites the checkpoint)
    for n_dev in (4, 1):
        d = tmp_path / f"resume_at_{n_dev}"
        shutil.copytree(d8, d)
        capsys.readouterr()
        res = train_vae(model, W, W[:32], cfg6, checkpoint_dir=str(d),
                        checkpoint_every=1, resume=True,
                        mesh=make_mesh(n_dev) if n_dev > 1 else None)
        assert "[resume] restored epoch 3" in capsys.readouterr().out
        assert res.history["epoch"] == full.history["epoch"]
        for col in ("train_total", "val_total"):
            np.testing.assert_allclose(res.history[col], full.history[col],
                                       rtol=1e-5, err_msg=f"{col}@{n_dev}dev")
        assert res.best_epoch == full.best_epoch
        for a, b in zip(jax.tree.leaves(full.last_params),
                        jax.tree.leaves(res.last_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


def test_misaligned_epoch_chunk_checkpoint_warns(tmp_path, windows):
    """epoch_chunk=2 with checkpoint_every=3 only saves at epochs divisible
    by 6 (chunk boundaries that are multiples of checkpoint_every) — the
    trainer must warn about the misalignment instead of silently weakening
    interruption safety (ADVICE r3)."""
    import warnings

    model = vae_from_config(VAEConfig(4, 3, 16, 1, 0.0))
    cfg = TrainConfig(epochs=6, batch_size=32, lr=1e-3, weight_decay=1e-5,
                      grad_clip=2.0, seed=0)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        train_vae(model, windows, windows[:32], cfg,
                  checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=3,
                  fused_epochs=True, epoch_chunk=2)
    msgs = [str(w.message) for w in rec]
    assert any("does not align" in m for m in msgs), msgs

    # aligned combos stay silent: chunk a divisor (saves exactly as
    # requested) or a multiple (saves every chunk, the max possible)
    for ec, ce in ((2, 4), (6, 3)):
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            train_vae(model, windows, windows[:32], cfg,
                      checkpoint_dir=str(tmp_path / f"ck{ec}_{ce}"),
                      checkpoint_every=ce, fused_epochs=True, epoch_chunk=ec)
        assert not any("does not align" in str(w.message) for w in rec)


def test_timer_and_throughput():
    t = Timer()
    with t.span("a"):
        sum(range(1000))
    with t.span("a"):
        sum(range(1000))
    rep = t.report()
    assert rep["a"]["calls"] == 2 and rep["a"]["seconds"] > 0
    th = throughput(5440, 0.035)
    assert th["windows_per_sec"] == pytest.approx(5440 / 0.035)


def test_timer_span_syncs_result_set_inside_block():
    """Device work launched INSIDE the span must be force-completed before
    the clock stops: the span yields a holder whose .result is synced at
    exit (a value passed at context ENTRY could not capture in-block work —
    the dispatch-only-milliseconds trap on async backends)."""
    import jax.numpy as jnp

    t = Timer()
    with t.span("gate") as s:
        s.result = jnp.arange(4096.0).sum()      # async dispatch
    assert t.report()["gate"]["seconds"] > 0
    assert float(s.result) == pytest.approx(4096 * 4095 / 2)
