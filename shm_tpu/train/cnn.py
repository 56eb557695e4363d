"""CNN classifier training: CE / weighted-focal loss, weighted sampling, early stop.

Rebuilds the two reference CNN trainers:

- 4DOF/Scripts/05_train_cnn.py — plain CE, Adam lr=1e-4 wd=5e-5, batch 100,
  <=50 epochs, early-stop patience 15, best-val-loss restore.
- Codes/06_train_cnn.py — inverse-frequency-alpha ``WeightedFocalLoss`` (gamma=2)
  + ``WeightedRandomSampler`` (here: per-epoch weighted resampling with
  ``jax.random.choice``), AdamW 3e-4 wd 1e-4, grad-clip 2.0, patience 25. That
  trainer selects its checkpoint by a VAL metric (ST-F2) rather than loss — pass
  ``val_metric_fn`` (higher is better) to reproduce it.

The per-epoch loop — (re)sampling, batching, forward/backward, BatchNorm running
stats, optimizer — is one jitted ``lax.scan``; evaluation uses running statistics.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from shm_tpu.config import TrainConfig
from shm_tpu.train.vae import make_optimizer, _batch_plan


def weighted_focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    alpha: jax.Array,
    gamma: float = 2.0,
) -> jax.Array:
    """Per-sample focal loss ``alpha_y * (1 - p_y)^gamma * (-log p_y)``.

    Parity: ``WeightedFocalLoss`` at Codes/06_train_cnn.py:195-207 (alpha is the
    per-class weight vector, typically inverse class frequency).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    pt = jnp.exp(-ce)
    a = alpha[labels]
    return a * (1.0 - pt) ** gamma * ce


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels)


def _build_cnn_programs(model, Ntr: int, Nva: int, cfg: TrainConfig,
                        use_focal: bool, focal_gamma: float, alpha,
                        weights, mesh, mesh_axis: str):
    """Construct every jitted program one ``train_cnn`` configuration needs
    (same design and rationale as ``train/vae.py::_build_train_programs``:
    repeat calls with the same configuration reuse the compiled programs —
    the seed flows through arguments, so e.g. the openLAB ``--quality``
    multi-seed study pays the compiles once). ``alpha``/``weights`` are
    closed over as program constants, so the cache keys on their VALUES
    (bytes) in :func:`_cnn_programs`.
    """
    from types import SimpleNamespace

    N = Ntr
    bs = min(cfg.batch_size, N)
    nb, pad = _batch_plan(N, bs)
    nvb, vpad = _batch_plan(Nva, bs)
    tx = make_optimizer(cfg)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P

        _dp = NamedSharding(mesh, _P(mesh_axis))

        def dp_constrain(x):
            return jax.lax.with_sharding_constraint(x, _dp)
    else:
        def dp_constrain(x):
            return x

    # window stacks are explicit arguments (jit closure constants re-stage per
    # call on this platform), and the epoch dispatches one jitted step per batch
    # — a lax.scan carrying the (params, batch_stats, opt_state) pytree runs ~5x
    # slower on v5e (every carry buffer is copied per iteration); see train/vae.py.
    @jax.jit
    def epoch_prologue(key):
        kperm, kbatch = jax.random.split(key)
        if weights is None:
            perm = jax.random.permutation(kperm, N)
            idx = jnp.concatenate([perm, perm[: pad]]) if pad else perm
            mask = jnp.concatenate([jnp.ones((N,), jnp.float32),
                                    jnp.zeros((pad,), jnp.float32)])
        else:
            # WeightedRandomSampler(replacement=True) semantics: draw EXACTLY
            # N samples proportional to weights each epoch
            # (Codes/06_train_cnn.py:379-392 — num_samples=N, last batch
            # short); the pad tail is masked out, not extra draws.
            idx = jax.random.choice(kperm, N, (N,), replace=True, p=weights)
            idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)]) if pad else idx
            mask = jnp.concatenate([jnp.ones((N,), jnp.float32),
                                    jnp.zeros((pad,), jnp.float32)])
        return idx.reshape(nb, bs), mask.reshape(nb, bs), jax.random.split(kbatch, nb)

    @jax.jit
    def batch_step(params, batch_stats, opt_state, Xtr, ytr, bidx, bmask, bk):
        xb, yb = dp_constrain(Xtr[bidx]), dp_constrain(ytr[bidx])

        def loss_fn(pp):
            out, mut = model.apply(
                {"params": pp, "batch_stats": batch_stats}, xb, train=True,
                rngs={"dropout": bk}, mutable=["batch_stats"],
            )
            if use_focal:
                per = weighted_focal_loss(out, yb, alpha, focal_gamma)
            else:
                per = cross_entropy_loss(out, yb)
            l = jnp.sum(per * bmask) / jnp.maximum(bmask.sum(), 1.0)
            return l, mut["batch_stats"]

        (l, new_bst), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bst, opt_state, l * bmask.sum(), bmask.sum()

    # jitted stats reduction (same rationale as train/vae.py::epoch_reduce):
    # eager-stacking the nb collected device scalars costs ~2*nb tiny
    # dispatches per epoch and was the site of an intermittent XLA-CPU
    # SIGABRT; the stack-then-sum shape matches fused_epoch_step's scan
    # reduction, preserving the loop/fused bit-identity contract.
    @jax.jit
    def epoch_reduce(ls, ns):
        return jnp.stack(ls).sum() / jnp.maximum(jnp.stack(ns).sum(), 1.0)

    def train_epoch(params, batch_stats, opt_state, Xtr, ytr, key):
        idx, mask, bkeys = epoch_prologue(key)
        ls, ns = [], []
        for b in range(nb):
            params, batch_stats, opt_state, l, n = batch_step(
                params, batch_stats, opt_state, Xtr, ytr, idx[b], mask[b], bkeys[b])
            ls.append(l)
            ns.append(n)
        return (params, batch_stats, opt_state,
                epoch_reduce(tuple(ls), tuple(ns)))

    @jax.jit
    def val_epoch(params, batch_stats, Xva, yva_j):
        Nv = Xva.shape[0]
        idx = jnp.arange(Nv)
        idx = jnp.concatenate([idx, jnp.zeros((vpad,), idx.dtype)]) if vpad else idx
        mask = jnp.concatenate([jnp.ones((Nv,), jnp.float32),
                                jnp.zeros((vpad,), jnp.float32)])
        idx, mask = idx.reshape(nvb, bs), mask.reshape(nvb, bs)

        def body(_, inp):
            bidx, bmask = inp
            xb, yb = dp_constrain(Xva[bidx]), dp_constrain(yva_j[bidx])
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              xb, train=False)
            if use_focal:
                per = weighted_focal_loss(out, yb, alpha, focal_gamma)
            else:
                per = cross_entropy_loss(out, yb)
            probs = jax.nn.softmax(out, axis=-1)
            return None, (jnp.sum(per * bmask), bmask.sum(), probs)

        _, (ls, ns, probs) = jax.lax.scan(body, None, (idx, mask))
        vloss = ls.sum() / jnp.maximum(ns.sum(), 1.0)
        return vloss, probs.reshape(-1, probs.shape[-1])[:Nv]

    # fused per-epoch program: identical math/key derivation to the loop above,
    # but the batch loop is a lax.scan inside ONE jitted call per epoch
    @jax.jit
    def fused_epoch_step(params, batch_stats, opt_state, Xtr, ytr, Xva, yva_j, key):
        idx, mask, bkeys = epoch_prologue(key)

        def body(carry, inp):
            p, bst, s = carry
            bidx, bmask, bk = inp
            p, bst, s, l, n = batch_step(p, bst, s, Xtr, ytr, bidx, bmask, bk)
            return (p, bst, s), (l, n)

        (params, batch_stats, opt_state), (ls, ns) = jax.lax.scan(
            body, (params, batch_stats, opt_state), (idx, mask, bkeys))
        tl = ls.sum() / jnp.maximum(ns.sum(), 1.0)
        vl, vprobs = val_epoch(params, batch_stats, Xva, yva_j)
        return params, batch_stats, opt_state, tl, vl, vprobs

    return SimpleNamespace(tx=tx, train_epoch=train_epoch,
                           fused_epoch_step=fused_epoch_step,
                           val_epoch=val_epoch)


_CNN_PROGRAM_CACHE: "OrderedDict" = OrderedDict()
_CNN_PROGRAM_CACHE_MAX = 8


def _cnn_programs(model, Xtr_shape, Xva_shape, cfg, loss, focal_gamma,
                  class_alpha, sample_weights, mesh, mesh_axis):
    from shm_tpu.train.vae import _cache_get_or_build, cfg_program_key

    # key on HOST numpy values (alpha/weights become program constants);
    # device conversion happens only inside build() on a cache miss — a hit
    # must cost zero device uploads/readbacks
    alpha_np = np.asarray(
        class_alpha if class_alpha is not None else np.ones(model.num_classes),
        np.float32)
    weights_np = None
    if sample_weights is not None:
        w = np.asarray(sample_weights, np.float64)
        weights_np = np.asarray(w / w.sum(), np.float32)
    use_focal = loss == "focal"

    def build(m):
        alpha = jnp.asarray(alpha_np)
        weights = None if weights_np is None else jnp.asarray(weights_np)
        return _build_cnn_programs(model, Xtr_shape[0], Xva_shape[0], cfg,
                                   use_focal, focal_gamma, alpha, weights,
                                   m, mesh_axis)

    if mesh is not None:
        return build(mesh)
    try:
        # cfg_program_key: the whole TrainConfig minus argument-passed
        # fields — mechanically includes any future field (stale-hit safe)
        key = (model, tuple(Xtr_shape), tuple(Xva_shape),
               cfg_program_key(cfg), use_focal, focal_gamma,
               alpha_np.tobytes(),
               None if weights_np is None else weights_np.tobytes())
        hash(key)
    except TypeError:        # unhashable custom model / non-dataclass config
        key = None
    return _cache_get_or_build(_CNN_PROGRAM_CACHE, _CNN_PROGRAM_CACHE_MAX,
                               key, lambda: build(None))


@dataclass
class CNNTrainResult:
    variables: Any                  # best {'params', 'batch_stats'}
    history: Dict[str, list] = field(default_factory=dict)
    best_val: float = float("inf")  # val loss at the selected epoch
    best_metric: float = float("-inf")
    best_epoch: int = -1
    stopped_epoch: int = -1
    seconds: float = 0.0


def train_cnn(
    model,
    Xtr: jax.Array,   # (N, H, W, C) NHWC inputs
    ytr: jax.Array,   # (N,) int labels
    Xva: jax.Array,
    yva: jax.Array,
    cfg: TrainConfig,
    *,
    loss: str = "ce",                    # "ce" | "focal"
    focal_gamma: float = 2.0,
    class_alpha: Optional[np.ndarray] = None,   # focal per-class weights
    sample_weights: Optional[np.ndarray] = None,  # weighted sampling probs (N,)
    val_metric_fn: Optional[Callable[[np.ndarray, np.ndarray], float]] = None,
    log_every: int = 0,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = True,
    fused_epoch: Optional[bool] = None,
    mesh=None,
    mesh_axis: str = "data",
) -> CNNTrainResult:
    """Train a CNN classifier; select best epoch by val loss (default) or by
    ``val_metric_fn(probs, yva)`` (higher wins) when given.

    ``fused_epoch``: run each epoch (batch loop + val pass) as ONE device
    program — one dispatch + one host fetch per epoch instead of one per
    batch. Same math, key derivation and batch order as the per-batch loop
    (only last-bit XLA fusion rounding differs; pinned by
    tests/test_train.py); early stopping and the host-side val metric keep
    their per-epoch semantics either way. Default (None): on for TPU
    backends, off on CPU.

    ``checkpoint_dir``/``checkpoint_every`` enable full-state mid-training
    checkpointing with exact resume (see shm_tpu.train.checkpoint).

    ``mesh``: 1-D device mesh for data-parallel SPMD training (see
    ``train_vae`` — same design: replicated state, minibatch sharded over
    ``mesh_axis`` by a sharding constraint, XLA inserts the grad psum).
    BatchNorm batch statistics are computed over the GLOBAL batch (the
    sharded reduction is partitioned by XLA), so the trajectory matches
    single-device exactly up to float reduction order — stricter than
    per-device stats + pmean. Pinned by tests/test_parallel.py."""
    Xtr, ytr = jnp.asarray(Xtr), jnp.asarray(ytr, jnp.int32)
    Xva, yva_j = jnp.asarray(Xva), jnp.asarray(yva, jnp.int32)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P

        _rep = NamedSharding(mesh, _P())
        Xtr = jax.device_put(Xtr, _rep)
        ytr = jax.device_put(ytr, _rep)
        Xva = jax.device_put(Xva, _rep)
        yva_j = jax.device_put(yva_j, _rep)

    # jitted programs, reused across calls with the same configuration
    # (same design as train/vae.py::_train_programs — the seed flows
    # through arguments, so e.g. the openLAB --quality multi-seed study
    # pays the compiles once)
    prog = _cnn_programs(model, Xtr.shape, Xva.shape, cfg, loss, focal_gamma,
                         class_alpha, sample_weights, mesh, mesh_axis)
    tx = prog.tx
    root = jax.random.PRNGKey(cfg.seed)
    k_init, root = jax.random.split(root)
    variables = model.init({"params": k_init}, Xtr[:2], train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    if mesh is not None:
        params = jax.device_put(params, _rep)
        batch_stats = jax.device_put(batch_stats, _rep)
        opt_state = jax.device_put(opt_state, _rep)
    train_epoch, fused_epoch_step, val_epoch = (
        prog.train_epoch, prog.fused_epoch_step, prog.val_epoch)

    hist: Dict[str, list] = {k: [] for k in ("epoch", "train_loss", "val_loss", "val_metric")}
    best_val = float("inf")
    best_metric = float("-inf")
    best_epoch = -1
    best_vars = {"params": params, "batch_stats": batch_stats}
    patience = cfg.early_stop_patience
    bad = 0
    stopped = cfg.epochs
    start_epoch = 1

    ckpt_path = None
    if checkpoint_dir:
        from shm_tpu.train.checkpoint import load_train_ckpt, save_train_ckpt

        ckpt_path = f"{checkpoint_dir}/cnn_train_state.msgpack"
        if resume:
            template = {"params": params, "batch_stats": batch_stats,
                        "opt_state": opt_state, "best_vars": best_vars, "rng": root}
            restored = load_train_ckpt(ckpt_path, template)
            if restored is not None:
                arrays, meta = restored
                params = arrays["params"]
                batch_stats = arrays["batch_stats"]
                opt_state = arrays["opt_state"]
                best_vars = arrays["best_vars"]
                root = arrays["rng"]
                hist = meta["history"]
                best_val = meta["best_val"]
                best_metric = meta["best_metric"]
                best_epoch = meta["best_epoch"]
                bad = meta["bad"]
                start_epoch = meta["epoch"] + 1
                print(f"[resume] restored epoch {meta['epoch']} from {ckpt_path}")

    t0 = time.perf_counter()

    if fused_epoch is None:
        from shm_tpu.ops import is_tpu_backend

        fused_epoch = is_tpu_backend()

    for epoch in range(start_epoch, cfg.epochs + 1):
        root, ke = jax.random.split(root)
        if fused_epoch:
            params, batch_stats, opt_state, tl, vl, vprobs = fused_epoch_step(
                params, batch_stats, opt_state, Xtr, ytr, Xva, yva_j, ke)
        else:
            params, batch_stats, opt_state, tl = train_epoch(
                params, batch_stats, opt_state, Xtr, ytr, ke)
            vl, vprobs = val_epoch(params, batch_stats, Xva, yva_j)
        # one host fetch per epoch (RPC round trips are expensive on the
        # tunneled TPU platform)
        tl, vl_f, vprobs_h = jax.device_get((tl, vl, vprobs))
        tl, vl_f = float(tl), float(vl_f)
        metric = (val_metric_fn(np.asarray(vprobs_h), np.asarray(yva))
                  if val_metric_fn is not None else None)

        hist["epoch"].append(epoch)
        hist["train_loss"].append(tl)
        hist["val_loss"].append(vl_f)
        hist["val_metric"].append(metric)

        if log_every and epoch % log_every == 0:
            m = f" | metric={metric:.4f}" if metric is not None else ""
            print(f"[cnn] epoch {epoch:03d}/{cfg.epochs} | train={tl:.6f} "
                  f"| val={vl_f:.6f}{m}")

        improved = (metric > best_metric) if val_metric_fn is not None else (vl_f < best_val)
        if improved:
            best_val = vl_f
            if metric is not None:
                best_metric = metric
            best_epoch = epoch
            best_vars = {
                "params": jax.tree.map(lambda x: x, params),
                "batch_stats": jax.tree.map(lambda x: x, batch_stats),
            }
            bad = 0
        else:
            bad += 1
            if patience and bad >= patience:
                stopped = epoch
                break

        if ckpt_path and checkpoint_every and epoch % checkpoint_every == 0:
            save_train_ckpt(
                ckpt_path,
                {"params": params, "batch_stats": batch_stats,
                 "opt_state": opt_state, "best_vars": best_vars, "rng": root},
                {"epoch": epoch, "best_val": best_val, "best_metric": best_metric,
                 "best_epoch": best_epoch, "bad": bad, "history": hist},
            )

    return CNNTrainResult(
        variables=best_vars,
        history=hist,
        best_val=best_val,
        best_metric=best_metric,
        best_epoch=best_epoch,
        stopped_epoch=stopped,
        seconds=time.perf_counter() - t0,
    )


def predict_probs(model, variables, X: jax.Array, batch_size: int = 4096) -> np.ndarray:
    """Softmax probabilities in padded batches (inference, running BN stats)."""
    X = jnp.asarray(X)
    N = X.shape[0]
    if N == 0:
        return np.zeros((0, model.num_classes), np.float32)
    nb, pad = _batch_plan(N, batch_size)
    Xp = jnp.concatenate([X, jnp.zeros((pad,) + X.shape[1:], X.dtype)]) if pad else X
    Xb = Xp.reshape(nb, batch_size, *X.shape[1:])

    @jax.jit
    def f(xb):
        return jax.nn.softmax(model.apply(variables, xb, train=False), axis=-1)

    out = jax.lax.map(f, Xb)
    return np.asarray(out.reshape(-1, out.shape[-1])[:N], np.float32)


__all__ = [
    "weighted_focal_loss",
    "cross_entropy_loss",
    "train_cnn",
    "predict_probs",
    "CNNTrainResult",
]
