"""Temporal-VAE training: optax loop with sigmoid KL annealing and best-val select.

Rebuilds the reference trainers as jit-compiled epoch scans:

- 4DOF/Scripts/03_train_vae.py (Adam lr=1e-3 wd=1e-5, grad-clip 2.0, KL sigmoid
  anneal warmup 0.3, batch 256, best-val checkpoint)
- 1_DOF/Scripts/03_train_vae.py (Adam lr=1e-3, 100 epochs, batch 64)
- Codes/04_train_vae.py (Adam lr=5e-4, grad-clip 2.0, batch 64)

Optimizer-semantics notes (to match torch):
- torch ``Adam(weight_decay=w)`` adds ``w * p`` to the (already clipped) gradient
  before the moment updates -> ``clip_by_global_norm -> add_decayed_weights ->
  scale_by_adam -> scale(-lr)``.

Execution structure (v5e-measured, 50-epoch 4DOF recipe): the whole run as
ONE fused device program (scan over epochs, bit-identical trajectory to the
loop) is the TPU default — 1.7x the per-batch loop (15.9s vs 27.0s); the
per-batch epoch loop remains for mid-training checkpointing and CPU tests.
``use_pallas_kernel=True`` swaps the forward/backward onto the custom-VJP
fused LSTM kernels (shm_tpu.ops.lstm_train) for another ~11% (14.2s/50
epochs; 69x the torch-CPU reference).
"""

from __future__ import annotations

import math
import time
from collections import OrderedDict
import dataclasses
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from shm_tpu.config import TrainConfig
from shm_tpu.models.vae import vae_loss


def kl_anneal_sigmoid(epoch: int, n_epochs: int, anneal_ratio: float = 0.3) -> float:
    """Sigmoid KL weight ramp; ``epoch`` is 1-based.

    Parity: 4DOF/Scripts/03_train_vae.py:120-135 (identical to the 1_DOF variant at
    1_DOF/Scripts/03_train_vae.py:26-30 up to the int() pivot rounding; this follows
    the 4DOF version: warm = max(1, int(n_epochs * ratio)), x = (e-1-warm)/warm).
    """
    e0 = epoch - 1
    warm = max(1, int(n_epochs * anneal_ratio))
    x = (e0 - warm) / float(max(warm, 1))
    return float(1.0 / (1.0 + math.exp(-x * 5.0)))


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """torch-compatible Adam/AdamW chain.

    coupled (torch ``Adam(weight_decay=w)``): clip -> add w*p to grad -> adam moments.
    decoupled (torch ``AdamW``): clip -> adam moments -> add w*p to the update.
    """
    parts = []
    if cfg.grad_clip and cfg.grad_clip > 0:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip))
    if cfg.weight_decay and cfg.weight_decay > 0 and not cfg.decoupled_wd:
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    parts.append(optax.scale_by_adam())
    if cfg.weight_decay and cfg.weight_decay > 0 and cfg.decoupled_wd:
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    parts.append(optax.scale(-cfg.lr))
    return optax.chain(*parts)


def _build_train_programs(model, N: int, Nva: int, T: int, D: int, in_dtype,
                          cfg: TrainConfig, val_sample: bool,
                          use_pallas_kernel: bool, kernel_dtype,
                          kernel_interpret: bool, mesh, mesh_axis: str):
    """Construct every jitted program one ``train_vae`` configuration needs.

    Hoisted out of ``train_vae`` (round 4) so repeat calls with the same
    (model, shapes, optimizer, flags) REUSE the compiled programs:
    ``train_vae`` used to define fresh closures per call, so every call
    retraced and recompiled — a multi-seed study paid the 10–25 s remote
    whole-run compile per seed (measured in tools/bench_train.py; the seed
    and all per-epoch keys flow through ARGUMENTS, so the programs are
    seed-independent). Cached via :func:`_train_programs` when ``mesh`` is
    None; mesh programs are built fresh (Mesh objects are session state,
    not worth keying).

    Everything returned is a pure function of the arguments here — no
    window data, params, or RNG state is captured.
    """
    from types import SimpleNamespace

    bs = cfg.batch_size
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

    # --- the per-batch loss+grads, shared by the loop and fused paths ---
    # use_pallas_kernel swaps the forward/backward onto the custom-VJP fused
    # LSTM scans (shm_tpu.ops.lstm_train); RNG semantics: eps + inverted-
    # dropout masks drawn explicitly from the batch key (a different but
    # equivalent stream to flax's rngs), identical between loop and fused runs.
    if use_pallas_kernel:
        from shm_tpu.ops.lstm_train import vae_train_forward

        if model.num_layers != 2:
            raise ValueError("use_pallas_kernel requires a 2-layer preset")
        if getattr(model, "cell", "lstm") != "lstm":
            raise ValueError(
                "use_pallas_kernel implements the LSTM recurrence only; "
                f"cell={model.cell!r} trains on the XLA path (its parallel "
                "scan needs no Pallas kernel)")
        H, Zd = model.hidden_dim, model.latent_dim
        drop = model.dropout

        def batch_loss_grads(p, xb, bmask, bk, kl_w):
            k_rep, k_de, k_dd = jax.random.split(bk, 3)
            eps = jax.random.normal(k_rep, (bs, Zd), jnp.float32)
            if drop > 0.0:
                keep = 1.0 - drop
                dm_e = jax.random.bernoulli(k_de, keep, (T, H, bs)).astype(jnp.float32) / keep
                dm_d = jax.random.bernoulli(k_dd, keep, (T, H, bs)).astype(jnp.float32) / keep
            else:
                dm_e = dm_d = jnp.ones((T, H, bs), jnp.float32)

            def loss_fn(pp):
                recon, mu, logvar = vae_train_forward(
                    pp, xb, eps, dm_e, dm_d,
                    use_layernorm=model.use_layernorm, batch_tile=bs,
                    dtype=kernel_dtype, interpret=kernel_interpret)
                total, r, kl = vae_loss(recon, xb, mu, logvar, kl_w, mask=bmask)
                return total, (r, kl)

            return jax.value_and_grad(loss_fn, has_aux=True)(p)
    else:
        def batch_loss_grads(p, xb, bmask, bk, kl_w):
            # under mesh= the minibatch is sharded over the data axis here;
            # everything downstream (forward, backward, loss mean) partitions
            # into per-device compute + one grad psum, courtesy of GSPMD
            xb = dp_constrain(xb)
            k_rep, k_drop = jax.random.split(bk)

            def loss_fn(pp):
                recon, mu, logvar = model.apply(
                    {"params": pp}, xb, sample=True, deterministic=False,
                    rngs={"reparam": k_rep, "dropout": k_drop},
                )
                total, r, kl = vae_loss(recon, xb, mu, logvar, kl_w, mask=bmask)
                return total, (r, kl)

            return jax.value_and_grad(loss_fn, has_aux=True)(p)

    # --- one-epoch train scan (pure; jitted directly or inside the fused run) ---
    # NOTE: the window stacks are explicit ARGUMENTS, not closures — jit embeds
    # closed-over arrays as program constants, which on this platform re-stages
    # them per call and inflates compile time (measured ~10x epoch slowdown).
    def train_epoch_core(params, opt_state, Ztr, key, kl_w):
        kperm, kbatch = jax.random.split(key)
        perm = jax.random.permutation(kperm, N)
        idx = jnp.concatenate([perm, perm[: pad]]) if pad else perm
        idx = idx.reshape(nb, bs)
        mask = jnp.concatenate([jnp.ones((N,), jnp.float32),
                                jnp.zeros((pad,), jnp.float32)]).reshape(nb, bs)
        bkeys = jax.random.split(kbatch, nb)

        def body(carry, inp):
            p, s = carry
            bidx, bmask, bk = inp
            xb = Ztr[bidx]
            (total, (r, kl)), grads = batch_loss_grads(p, xb, bmask, bk, kl_w)
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            n = bmask.sum()
            return (p, s), (total * n, r * n, kl * n, n)

        (params, opt_state), (tl, rl, kll, ns) = jax.lax.scan(
            body, (params, opt_state), (idx, mask, bkeys)
        )
        denom = jnp.maximum(ns.sum(), 1.0)
        return params, opt_state, tl.sum() / denom, rl.sum() / denom, kll.sum() / denom

    def val_epoch_core(params, Zva, key, kl_w):
        Nv = Zva.shape[0]
        idx = jnp.arange(Nv)
        idx = jnp.concatenate([idx, jnp.zeros((vpad,), idx.dtype)]) if vpad else idx
        idx = idx.reshape(nvb, bs)
        mask = jnp.concatenate([jnp.ones((Nv,), jnp.float32),
                                jnp.zeros((vpad,), jnp.float32)]).reshape(nvb, bs)
        bkeys = jax.random.split(key, nvb)

        def body(_, inp):
            bidx, bmask, bk = inp
            xb = dp_constrain(Zva[bidx])
            rngs = {"reparam": bk} if val_sample else {}
            recon, mu, logvar = model.apply(
                {"params": params}, xb, sample=val_sample, deterministic=True,
                rngs=rngs,
            )
            total, r, kl = vae_loss(recon, xb, mu, logvar, kl_w, mask=bmask)
            n = bmask.sum()
            return None, (total * n, r * n, kl * n, n)

        _, (tl, rl, kll, ns) = jax.lax.scan(body, None, (idx, mask, bkeys))
        denom = jnp.maximum(ns.sum(), 1.0)
        return tl.sum() / denom, rl.sum() / denom, kll.sum() / denom

    # --- fused-epochs chunk program (compiled per distinct chunk LENGTH;
    # epoch_chunk=None -> one whole-run program) ---
    @jax.jit
    def run_chunk(carry, Ztr, Zva, kl_ws, keys, e_idx):
        def epoch_body(carry, inp):
            p, s, best_val, best_p, best_e = carry
            kl_w, ks, e_i = inp
            p, s, tl, rl, kl = train_epoch_core(p, s, Ztr, ks[0], kl_w)
            vl, vr, vkl = val_epoch_core(p, Zva, ks[1], kl_w)
            improved = vl < best_val
            best_val = jnp.where(improved, vl, best_val)
            best_e = jnp.where(improved, e_i, best_e)
            best_p = jax.tree.map(
                lambda b, q: jnp.where(improved, q, b), best_p, p)
            return (p, s, best_val, best_p, best_e), (tl, rl, kl, vl, vr, vkl)

        return jax.lax.scan(epoch_body, carry, (kl_ws, keys, e_idx))

    # --- per-batch stepping for the epoch loop (checkpointing / CPU path) ---
    # Reproduces train_epoch_core's key derivation and batch order exactly, so
    # fused/loop/resume runs stay bit-identical; needed whenever per-epoch host
    # control (mid-training checkpoints) is requested.
    @jax.jit
    def batch_step(params, opt_state, Ztr, bidx, bmask, bk, kl_w):
        xb = Ztr[bidx]
        (total, (r, kl)), grads = batch_loss_grads(params, xb, bmask, bk, kl_w)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        n = bmask.sum()
        return params, opt_state, total * n, r * n, kl * n, n

    @jax.jit
    def epoch_prologue(key):
        kperm, kbatch = jax.random.split(key)
        perm = jax.random.permutation(kperm, N)
        idx = jnp.concatenate([perm, perm[: pad]]) if pad else perm
        return idx.reshape(nb, bs), jax.random.split(kbatch, nb)

    mask_np = np.concatenate([np.ones((N,), np.float32),
                              np.zeros((pad,), np.float32)]).reshape(nb, bs)
    mask_dev = jnp.asarray(mask_np)

    # The epoch-stats reduction runs UNDER JIT (the nb collected device
    # scalars arrive as one pytree argument): stacking them eagerly instead
    # issues ~4*nb tiny dispatches per epoch — per-op RPC overhead on the
    # tunneled TPU, and the exact site of an intermittent XLA-CPU SIGABRT
    # observed 4/4 times in this loop's eager broadcast_in_dim dispatch
    # (CLAUDE.md; tests/test_cli.py::test_stage1dof_train_vae_devices_flag...).
    # Same stack-then-sum reduction shape as train_epoch_core, so the
    # loop/fused bit-identity contract is unchanged.
    @jax.jit
    def epoch_reduce(tls, rls, kls, ns):
        denom = jnp.maximum(jnp.stack(ns).sum(), 1.0)
        return (jnp.stack(tls).sum() / denom, jnp.stack(rls).sum() / denom,
                jnp.stack(kls).sum() / denom)

    def train_epoch(params, opt_state, Ztr, key, kl_w):
        idx, bkeys = epoch_prologue(key)
        tls, rls, kls, ns = [], [], [], []
        for b in range(nb):
            params, opt_state, tl, rl, kl, n = batch_step(
                params, opt_state, Ztr, idx[b], mask_dev[b], bkeys[b], kl_w)
            tls.append(tl); rls.append(rl); kls.append(kl); ns.append(n)
        tl, rl, kl = epoch_reduce(tuple(tls), tuple(rls), tuple(kls), tuple(ns))
        return params, opt_state, tl, rl, kl

    val_epoch = jax.jit(val_epoch_core)

    return SimpleNamespace(tx=tx, run_chunk=run_chunk,
                           train_epoch=train_epoch, val_epoch=val_epoch)


# Bounded LRU program cache: see _build_train_programs. The key holds every
# input the programs close over — model (flax Modules hash by field values),
# shapes/dtype, the optimizer-relevant TrainConfig fields, and the path
# flags. Seed/epochs/KL-warmup flow through arguments, so they are NOT keys.
# Memory note: the bound limits CONFIGURATIONS; within one entry, the jit
# wrappers still accumulate one executable per distinct argument-shape set
# (e.g. per fused chunk length) — a long-lived process sweeping many epoch
# counts should call clear_program_caches() between sweeps.
_PROGRAM_CACHE: "OrderedDict[tuple, Any]" = OrderedDict()
_PROGRAM_CACHE_MAX = 8


def _cache_get_or_build(cache: OrderedDict, maxsize: int, key, build):
    """Keyed LRU lookup shared by the VAE and CNN program caches.

    ``key=None`` (unhashable inputs) builds fresh without caching; a hit
    is promoted to most-recently-used so a hot configuration interleaved
    with many one-off ones is never the eviction victim."""
    if key is None:
        return build()
    prog = cache.get(key)
    if prog is None:
        prog = build()
        cache[key] = prog
        while len(cache) > maxsize:
            cache.popitem(last=False)
    else:
        cache.move_to_end(key)
    return prog


def cfg_program_key(cfg: TrainConfig):
    """The TrainConfig portion of a program-cache key, derived MECHANICALLY.

    The compiled programs depend on every TrainConfig field EXCEPT the ones
    proven to flow through program *arguments* (seed, epochs,
    kl_warmup_ratio, early_stop_patience — neutralized below). Using the
    whole (frozen, hashable) config with those fields zeroed means any
    FUTURE TrainConfig field is part of the key by default — a new field
    consumed by make_optimizer or a program builder can never produce a
    stale cache hit; at worst it costs a redundant rebuild. Raises
    TypeError for non-TrainConfig config objects (callers fall back to
    uncached builds on that)."""
    return dataclasses.replace(cfg, seed=0, epochs=0, kl_warmup_ratio=0.0,
                               early_stop_patience=0)


def clear_program_caches() -> None:
    """Drop every cached training program (VAE and CNN), releasing their
    compiled executables and device-resident closure constants."""
    from shm_tpu.train import cnn as _cnn

    _PROGRAM_CACHE.clear()
    _cnn._CNN_PROGRAM_CACHE.clear()


def _train_programs(model, N, Nva, T, D, in_dtype, cfg, val_sample,
                    use_pallas_kernel, kernel_dtype, kernel_interpret,
                    mesh, mesh_axis):
    if mesh is not None:
        return _build_train_programs(model, N, Nva, T, D, in_dtype, cfg,
                                     val_sample, use_pallas_kernel,
                                     kernel_dtype, kernel_interpret,
                                     mesh, mesh_axis)
    try:
        key = (model, N, Nva, T, D, str(in_dtype), cfg_program_key(cfg),
               val_sample, use_pallas_kernel, str(kernel_dtype),
               kernel_interpret)
        hash(key)
    except TypeError:    # unhashable custom model / non-dataclass config —
        key = None       # just build fresh
    return _cache_get_or_build(
        _PROGRAM_CACHE, _PROGRAM_CACHE_MAX, key,
        lambda: _build_train_programs(model, N, Nva, T, D, in_dtype, cfg,
                                      val_sample, use_pallas_kernel,
                                      kernel_dtype, kernel_interpret,
                                      None, mesh_axis))


def _batch_plan(N: int, bs: int) -> Tuple[int, int]:
    nb = -(-N // bs)
    pad = nb * bs - N
    return nb, pad


@dataclass
class VAETrainResult:
    params: Any                      # best-val params
    last_params: Any
    history: Dict[str, list] = field(default_factory=dict)
    best_val: float = float("inf")
    best_epoch: int = -1
    seconds: float = 0.0


def train_vae(
    model,
    Ztr: jax.Array,
    Zva: jax.Array,
    cfg: TrainConfig,
    *,
    init_params: Optional[Any] = None,
    val_sample: bool = True,
    log_every: int = 0,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = True,
    fused_epochs: Optional[bool] = None,
    epoch_chunk: Optional[int] = None,
    use_pallas_kernel: bool = False,
    kernel_dtype=jnp.bfloat16,
    kernel_interpret: bool = False,
    mesh=None,
    mesh_axis: str = "data",
) -> VAETrainResult:
    """Train a TemporalVAE on normalized windows; returns best-val params + history.

    ``fused_epochs``: run the WHOLE multi-epoch training as one jitted
    ``lax.scan`` over epochs, with best-val selection on device — one dispatch
    + one host fetch for the entire run. Produces bit-identical trajectories
    to the epoch loop (same precomputed per-epoch keys; pinned by
    tests/test_fused_epochs.py). Default (None): on for TPU backends unless
    mid-training checkpointing is requested, off on CPU.

    ``epoch_chunk`` (with ``fused_epochs``): compile a K-epoch program and
    dispatch it ceil(E/K) times instead of one whole-run program — the middle
    ground when the whole-run compile is expensive on the remote platform
    (the openLAB preset: ~155-200 s whole-run compile vs seconds-level for a
    chunk; measured in tools/probe_epoch_chunks.py). The carry (params, opt
    state, on-device best-val selection) stays device-resident between
    dispatches, so the trajectory is bit-identical to the whole-run program
    and the loop. If K does not divide E the remainder chunk costs a second
    compile — prefer K | E. A perf knob only: it has no effect when the
    fused path is not taken (``fused_epochs=False`` or the CPU auto-default)
    — the loop already pays no whole-run compile.

    ``Ztr``/``Zva``: (N, T, D) normalized window stacks (already on device or host).

    With ``checkpoint_dir`` + ``checkpoint_every=k``, the FULL training state
    (params, optimizer moments, best-val selection, PRNG key, history) persists
    every k epochs and an interrupted run resumes exactly (a capability the
    reference lacks — SURVEY.md §5 checkpoint/resume). By default this selects
    the per-batch loop; pass ``fused_epochs=True`` to keep fused-path speed —
    the run then dispatches in K-epoch chunks (K = ``epoch_chunk`` or
    ``checkpoint_every``) and checkpoints at chunk boundaries that are
    multiples of ``checkpoint_every``. The checkpoint format is identical
    across paths, so a loop-checkpointed run resumes fused and vice versa,
    on the same bit-identical trajectory.

    ``mesh``: a 1-D ``jax.sharding.Mesh`` (see ``shm_tpu.parallel.make_mesh``)
    turns every execution structure above — per-batch loop, fused whole-run
    scan, checkpointed/resumed runs — into data-parallel SPMD: params/window
    stacks are replicated, each minibatch is sharded over ``mesh_axis`` via a
    sharding constraint, and XLA partitions the forward/backward with a psum
    over ICI for the gradient reduction. The program is the SAME math as
    single-device (one global batch per step, global-batch loss mean, one
    RNG stream) so trajectories match the single-device run exactly up to
    float reduction order (pinned by tests/test_parallel.py). The reference
    has no distributed training at all (SURVEY.md §2.4; single-device loop at
    4DOF/Scripts/03_train_vae.py:254-278). Incompatible with
    ``use_pallas_kernel`` (custom calls are not auto-partitionable).
    """
    if epoch_chunk is not None and epoch_chunk < 1:
        raise ValueError(f"epoch_chunk must be >= 1, got {epoch_chunk}")
    if mesh is not None and use_pallas_kernel:
        raise ValueError(
            "mesh= data-parallel training uses XLA auto-partitioning, which "
            "cannot split the Pallas training kernels (custom calls); pass "
            "use_pallas_kernel=False with mesh=, or train single-device")
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P

        _rep = NamedSharding(mesh, _P())
        Ztr = jax.device_put(jnp.asarray(Ztr), _rep)
        Zva = jax.device_put(jnp.asarray(Zva), _rep)

    Ztr = jnp.asarray(Ztr)
    Zva = jnp.asarray(Zva)
    N, T, D = Ztr.shape

    # jitted programs, REUSED across calls with the same configuration (the
    # seed and all per-epoch keys are arguments): a multi-seed study pays
    # the compiles once (_build_train_programs)
    prog = _train_programs(model, N, Zva.shape[0], T, D, Ztr.dtype, cfg,
                           val_sample, use_pallas_kernel, kernel_dtype,
                           kernel_interpret, mesh, mesh_axis)
    tx = prog.tx
    root = jax.random.PRNGKey(cfg.seed)
    # the whole key schedule (epoch_keys below) derives from cfg.seed AND
    # whether an init split is consumed here — recorded in checkpoints so a
    # resume with mismatched init_params-presence fails loudly instead of
    # silently diverging the trajectory
    init_consumed = init_params is None
    if init_params is None:
        k_init, root = jax.random.split(root)
        init_params = model.init(
            {"params": k_init}, jnp.zeros((2, T, D), Ztr.dtype)
        )["params"]
    params = init_params
    opt_state = tx.init(params)
    if mesh is not None:
        # replicate the training state on every device of the mesh
        params = jax.device_put(params, _rep)
        opt_state = jax.device_put(opt_state, _rep)

    # ----- fused-epochs fast path: the ENTIRE training run is one device
    # program (scan over epochs; best-val selection on device) — one dispatch,
    # one host fetch. With checkpoint_dir + checkpoint_every it still applies
    # when requested EXPLICITLY (fused_epochs=True): the run dispatches in
    # chunks and the full training state persists at chunk boundaries, so
    # resumable training keeps fused-path speed. -----
    if fused_epochs is None:
        # v5e, 50-epoch 4DOF recipe (tools/bench_train.py, round 2): the fused
        # whole-run program is 1.7x the per-batch loop (15.9s vs 27.0s; 14.2s
        # with the Pallas kernel) AND compiles faster, with a bit-identical
        # trajectory — so it is the default wherever per-epoch host control
        # isn't needed (checkpointing auto-defaults to the loop below, but
        # composes with the fused path when fused_epochs=True is explicit).
        # CPU keeps the loop: whole-run compile dominates small test workloads.
        from shm_tpu.ops import is_tpu_backend

        fused_epochs = checkpoint_dir is None and is_tpu_backend()
    # per-epoch keys are derived identically in BOTH paths (all from the initial
    # root), so a fused run, a loop run, and a checkpointed/resumed run produce
    # bit-identical training trajectories.
    E = cfg.epochs
    epoch_keys = jax.random.split(root, 2 * E).reshape(E, 2, 2)

    # --- training-state init + checkpoint restore, shared by BOTH execution
    # structures (the checkpoint format is path-agnostic: a run checkpointed
    # by the loop resumes on the fused path and vice versa) ---
    hist: Dict[str, list] = {k: [] for k in (
        "epoch", "kl_w", "train_total", "train_recon", "train_kl",
        "val_total", "val_recon", "val_kl")}
    best_val = float("inf")
    best_epoch = -1
    best_params = params
    start_epoch = 1

    ckpt_path = None
    if checkpoint_dir:
        from shm_tpu.train.checkpoint import load_train_ckpt, save_train_ckpt

        ckpt_path = f"{checkpoint_dir}/vae_train_state.msgpack"
        if resume:
            template = {"params": params, "opt_state": opt_state,
                        "best_params": params, "rng": root}
            restored = load_train_ckpt(ckpt_path, template)
            if restored is not None:
                arrays, meta = restored
                if meta.get("init_consumed", init_consumed) != init_consumed:
                    raise ValueError(
                        "checkpoint was written with a different "
                        "init_params-presence than this resume call; the "
                        "epoch key schedule would silently diverge "
                        f"(checkpoint init_consumed={meta['init_consumed']})")
                params = arrays["params"]
                opt_state = arrays["opt_state"]
                best_params = arrays["best_params"]
                # NOTE: arrays["rng"] is stored for inspection only — the key
                # schedule is re-derived from cfg.seed (+ init_consumed), so
                # resume reproduces the original trajectory bit-for-bit
                hist = meta["history"]
                best_val = meta["best_val"]
                best_epoch = meta["best_epoch"]
                start_epoch = meta["epoch"] + 1
                print(f"[resume] restored epoch {meta['epoch']} from {ckpt_path}")
            else:
                # resume-if-exists semantics (first launch of a resumable job
                # starts fresh) — but LOUDLY: training is seed-deterministic,
                # so a silently-ignored missing checkpoint (path typo, format
                # drift) would be indistinguishable from a working resume
                print(f"[resume] no checkpoint at {ckpt_path}; starting fresh")

    if fused_epochs:
        kl_ws = jnp.asarray([
            kl_anneal_sigmoid(e, E, cfg.kl_warmup_ratio) for e in range(1, E + 1)
        ], jnp.float32)
        keys = epoch_keys
        e_idx_all = jnp.arange(1, E + 1, dtype=jnp.int32)
        # with periodic checkpointing, chunks default to checkpoint_every so
        # every checkpoint epoch lands on a chunk boundary; an explicit
        # epoch_chunk wins (state then persists only at boundaries that are
        # multiples of checkpoint_every — prefer epoch_chunk | checkpoint_every)
        if ckpt_path and checkpoint_every:
            chunk = min(epoch_chunk or checkpoint_every, E)
            if chunk % checkpoint_every != 0 and checkpoint_every % chunk != 0:
                # e.g. epoch_chunk=2, checkpoint_every=3 -> saves only at
                # epochs 6, 12, ... (boundaries that are multiples of 3):
                # far rarer than requested, silently weakening interruption
                # safety — say so instead of relying on a comment
                import warnings

                warnings.warn(
                    f"epoch_chunk={chunk} does not align with "
                    f"checkpoint_every={checkpoint_every}: checkpoints only "
                    f"fire at chunk boundaries divisible by checkpoint_every "
                    f"(every lcm={chunk * checkpoint_every // math.gcd(chunk, checkpoint_every)} "
                    f"epochs). Use epoch_chunk that is a multiple (or "
                    f"divisor) of checkpoint_every.", stacklevel=2)
        else:
            chunk = min(epoch_chunk or E, E)

        # one compiled program per distinct chunk LENGTH (epoch_chunk=None
        # -> one whole-run program); reused across train_vae calls via the
        # program cache
        run_chunk = prog.run_chunk

        t0 = time.perf_counter()
        carry = (params, opt_state, jnp.float32(best_val), best_params,
                 jnp.int32(best_epoch))
        base_hist = {k: list(v) for k, v in hist.items()}
        kl_host = np.asarray(kl_ws)     # f32-rounded, matching loop history
        stats_dev: list = []            # not-yet-fetched chunk stats
        stats_host: list = []           # fetched per-chunk 6-tuples

        def _drain_stats():
            nonlocal stats_dev
            if stats_dev:
                stats_host.extend(jax.device_get(stats_dev))
                stats_dev = []

        def _hist_now():
            cols = [
                np.concatenate([np.asarray(c[i], np.float64)
                                for c in stats_host])
                if stats_host else np.zeros((0,), np.float64)
                for i in range(6)]
            epochs = list(range(start_epoch, start_epoch + len(cols[0])))
            return {
                "epoch": base_hist["epoch"] + epochs,
                "kl_w": base_hist["kl_w"] + [float(kl_host[e - 1])
                                             for e in epochs],
                "train_total": base_hist["train_total"] + cols[0].tolist(),
                "train_recon": base_hist["train_recon"] + cols[1].tolist(),
                "train_kl": base_hist["train_kl"] + cols[2].tolist(),
                "val_total": base_hist["val_total"] + cols[3].tolist(),
                "val_recon": base_hist["val_recon"] + cols[4].tolist(),
                "val_kl": base_hist["val_kl"] + cols[5].tolist(),
            }

        # the carry never leaves the device between chunk dispatches, so the
        # chunked run's trajectory is bit-identical to the whole-run program;
        # per-epoch stats are fetched lazily (at checkpoint saves and at the
        # end) so a no-checkpoint run keeps its single end-of-run host fetch
        for c0 in range(start_epoch - 1, E, chunk):
            c1 = min(c0 + chunk, E)
            carry, stats_c = run_chunk(carry, Ztr, Zva, kl_ws[c0:c1],
                                       keys[c0:c1], e_idx_all[c0:c1])
            stats_dev.append(stats_c)
            if ckpt_path and checkpoint_every and c1 % checkpoint_every == 0:
                _drain_stats()
                p_c, s_c, bv_d, bp_c, be_d = carry
                save_train_ckpt(
                    ckpt_path,
                    {"params": p_c, "opt_state": s_c, "best_params": bp_c,
                     "rng": root},
                    {"epoch": c1, "best_val": float(jax.device_get(bv_d)),
                     "best_epoch": int(jax.device_get(be_d)),
                     "history": _hist_now(), "init_consumed": init_consumed},
                )
        params, opt_state, best_val_d, best_params, best_epoch_d = carry
        _drain_stats()
        best_val = float(jax.device_get(best_val_d))
        best_epoch = int(jax.device_get(best_epoch_d))
        seconds = time.perf_counter() - t0
        hist = _hist_now()
        if log_every:
            # only the epochs THIS call ran (a resume's base_hist epochs were
            # already logged by the interrupted run), gated on the absolute
            # epoch number to match the loop path's `epoch % log_every == 0`
            # cadence
            for i in range(len(base_hist["epoch"]), len(hist["epoch"])):
                if hist["epoch"][i] % log_every != 0:
                    continue
                print(f"[train] epoch {hist['epoch'][i]:03d}/{E} "
                      f"| kl_w={hist['kl_w'][i]:.6f} "
                      f"| total={hist['train_total'][i]:.6f} "
                      f"| recon={hist['train_recon'][i]:.6f} "
                      f"| kl={hist['train_kl'][i]:.6f}")
                print(f"[val  ] epoch {hist['epoch'][i]:03d}/{E} "
                      f"| total={hist['val_total'][i]:.6f}")
        return VAETrainResult(
            params=best_params, last_params=params, history=hist,
            best_val=best_val, best_epoch=best_epoch, seconds=seconds,
        )

    # --- per-batch stepping for the epoch loop (checkpointing / CPU path),
    # built once per configuration in _build_train_programs: reproduces the
    # fused path's key derivation and batch order exactly, so fused/loop/
    # resume runs stay bit-identical ---
    train_epoch, val_epoch = prog.train_epoch, prog.val_epoch

    t0 = time.perf_counter()

    for epoch in range(start_epoch, cfg.epochs + 1):
        kl_w = jnp.float32(kl_anneal_sigmoid(epoch, cfg.epochs, cfg.kl_warmup_ratio))
        ke, kv = epoch_keys[epoch - 1][0], epoch_keys[epoch - 1][1]
        params, opt_state, tl, rl, kl = train_epoch(params, opt_state, Ztr, ke, kl_w)
        vl, vr, vkl = val_epoch(params, Zva, kv, kl_w)
        # ONE host fetch per epoch (each separate float() costs a full RPC
        # round trip on the tunneled TPU platform)
        tl, rl, kl, vl_f, vr, vkl = map(float, jax.device_get((tl, rl, kl, vl, vr, vkl)))

        hist["epoch"].append(epoch)
        hist["kl_w"].append(float(kl_w))
        hist["train_total"].append(tl)
        hist["train_recon"].append(rl)
        hist["train_kl"].append(kl)
        hist["val_total"].append(vl_f)
        hist["val_recon"].append(vr)
        hist["val_kl"].append(vkl)

        if log_every and epoch % log_every == 0:
            print(f"[train] epoch {epoch:03d}/{cfg.epochs} | kl_w={float(kl_w):.6f} | "
                  f"total={tl:.6f} | recon={rl:.6f} | kl={kl:.6f}")
            print(f"[val  ] epoch {epoch:03d}/{cfg.epochs} | total={vl_f:.6f}")

        if vl_f < best_val:
            best_val = vl_f
            best_epoch = epoch
            best_params = jax.tree.map(lambda x: x, params)

        if ckpt_path and checkpoint_every and epoch % checkpoint_every == 0:
            save_train_ckpt(
                ckpt_path,
                {"params": params, "opt_state": opt_state,
                 "best_params": best_params, "rng": root},
                {"epoch": epoch, "best_val": best_val, "best_epoch": best_epoch,
                 "history": hist, "init_consumed": init_consumed},
            )

    return VAETrainResult(
        params=best_params,
        last_params=params,
        history=hist,
        best_val=best_val,
        best_epoch=best_epoch,
        seconds=time.perf_counter() - t0,
    )


def reconstruction_mse(
    model,
    params,
    Z: jax.Array,
    *,
    batch_size: int = 2048,
    sample: bool = False,
    key: Optional[jax.Array] = None,
    fused: str | bool = "auto",
) -> np.ndarray:
    """Per-window full MSE ``((Z - Z_hat)**2).mean(axis=(1, 2))`` in padded batches.

    Parity: ``full_mse_scores_batched`` at 4DOF/Scripts/04_vae_thresholding.py:113-124
    (with ``sample=True`` reproducing the reference's stochastic eval; the default
    ``sample=False`` scores the posterior-mean reconstruction).

    ``fused="auto"`` routes deterministic scoring through the gate-only Pallas
    kernel on TPU (no residual store, whole pass VMEM-resident).
    """
    Z = jnp.asarray(Z)
    N = Z.shape[0]
    if N == 0:
        return np.zeros((0,), np.float32)

    if fused == "auto":
        from shm_tpu.ops import auto_fused_gate

        fused = not sample and auto_fused_gate(model)
    if fused and not sample:
        cell = getattr(model, "cell", "lstm")
        if cell == "min_gru":
            from shm_tpu.ops import fused_mingru_gate as gate_fn
        elif cell == "attention":
            from shm_tpu.ops import fused_attention_gate as gate_fn
        else:
            from shm_tpu.ops import fused_vae_gate as gate_fn

        mse, _ = gate_fn(
            params, Z, num_layers=model.num_layers,
            use_layernorm=model.use_layernorm, with_residual=False,
            io_dtype=jnp.bfloat16,
        )
        return np.asarray(mse, np.float32)
    nb, pad = _batch_plan(N, batch_size)
    Zp = jnp.concatenate([Z, jnp.zeros((pad,) + Z.shape[1:], Z.dtype)]) if pad else Z
    Zb = Zp.reshape(nb, batch_size, *Z.shape[1:])
    if key is None:
        key = jax.random.PRNGKey(0)
    bkeys = jax.random.split(key, nb)

    @jax.jit
    def score(xb, bk):
        rngs = {"reparam": bk} if sample else {}
        recon, _, _ = model.apply({"params": params}, xb, sample=sample, rngs=rngs)
        return ((xb - recon) ** 2).mean(axis=(1, 2))

    out = jax.lax.map(lambda inp: score(*inp), (Zb, bkeys))
    return np.asarray(out.reshape(-1)[:N], np.float32)


__all__ = [
    "kl_anneal_sigmoid",
    "make_optimizer",
    "train_vae",
    "reconstruction_mse",
    "VAETrainResult",
]
