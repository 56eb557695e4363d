"""Multi-chip scale-out: data parallelism over a ``jax.sharding.Mesh``.

The reference is single-process/single-device with no distributed backend
(SURVEY.md §2.4: no torch.distributed/NCCL/MPI anywhere). The scale axis of this
workload is the *window count* (thousands of overlapping windows per run, models
<1M params), so the TPU-native strategy is pure data parallelism:

- parameters are replicated on every chip;
- the window batch is sharded along a 1-D ``data`` mesh axis;
- gradients are combined with ``psum`` over ICI inside ``shard_map``;
- bulk inference shards the batch and needs no collectives at all.

Tensor/pipeline/expert parallelism are intentionally not implemented: every model
fits per-chip with room to spare (largest: 4DOF VAE ~600k params), so any
cross-chip model partitioning would only add latency. Sequence parallelism is
likewise N/A (T <= 200; the T-loop runs on-chip as a ``lax.scan``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shm_tpu.models.vae import vae_loss


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices (default: all).

    Raises when more devices are requested than exist — silently truncating
    would train on fewer chips than the user asked for with only an
    easily-missed log line as the signal.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(
            f"requested a {n}-device mesh but only {len(devs)} JAX device(s) "
            f"are available on this host (platform "
            f"{devs[0].platform if devs else 'none'}); for a virtual CPU mesh "
            "set XLA_FLAGS=--xla_force_host_platform_device_count=N")
    return Mesh(np.array(devs[:n]), (axis,))


def make_mesh_opt(devices: Optional[int], axis: str = "data") -> Optional[Mesh]:
    """CLI ``--devices N`` adapter: a 1-D data mesh over the first N local
    devices for data-parallel training (SURVEY.md §2.4), or None for the
    single-device path when the flag is absent or N <= 1."""
    if not devices or devices <= 1:
        return None
    return make_mesh(devices, axis)


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place a batch-major array sharded along the mesh's data axis."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) on every device of the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def make_dp_vae_train_step(model, tx: optax.GradientTransformation, mesh: Mesh,
                           axis: str = "data"):
    """Data-parallel VAE train step: per-shard grads + psum-mean, SPMD via shard_map.

    Inputs: replicated (params, opt_state), batch sharded over ``axis``; the
    returned step is jitted and keeps everything device-resident.
    """

    def local_step(params, opt_state, xb, key, kl_w):
        k_rep, k_drop = jax.random.split(jax.random.fold_in(key, jax.lax.axis_index(axis)))

        def loss_fn(p):
            recon, mu, logvar = model.apply(
                {"params": p}, xb, sample=True, deterministic=False,
                rngs={"reparam": k_rep, "dropout": k_drop},
            )
            total, r, kl = vae_loss(recon, xb, mu, logvar, kl_w)
            return total, (r, kl)

        (total, (r, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # combine across the data axis (ICI collective)
        grads = jax.lax.pmean(grads, axis)
        total = jax.lax.pmean(total, axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(step)


def make_dp_cnn_train_step(model, tx: optax.GradientTransformation, mesh: Mesh,
                           axis: str = "data", loss: str = "ce",
                           focal_gamma: float = 2.0, alpha=None):
    """Data-parallel CNN train step: per-shard grads + BatchNorm batch-stats,
    both pmean'd over the data axis inside shard_map."""
    from shm_tpu.train.cnn import cross_entropy_loss, weighted_focal_loss

    use_focal = loss == "focal"
    alpha_arr = jnp.asarray(alpha if alpha is not None
                            else np.ones(model.num_classes), jnp.float32)

    def local_step(params, batch_stats, opt_state, xb, yb, key):
        bk = jax.random.fold_in(key, jax.lax.axis_index(axis))

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, xb, train=True,
                rngs={"dropout": bk}, mutable=["batch_stats"],
            )
            per = (weighted_focal_loss(out, yb, alpha_arr, focal_gamma)
                   if use_focal else cross_entropy_loss(out, yb))
            return per.mean(), mut["batch_stats"]

        (l, new_bst), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, axis)
        new_bst = jax.lax.pmean(new_bst, axis)
        l = jax.lax.pmean(l, axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bst, opt_state, l

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(step)


def make_dp_hybrid_fn(hybrid_fn, mesh: Mesh, axis: str = "data"):
    """Data-parallel wrapper for the fused hybrid pipeline: shard the window
    batch, replicate everything else. No collectives — outputs stay sharded."""

    def run(vae_params, cnn_variables, W, mean, std, threshold, key=None):
        W = shard_batch(W, mesh, axis)
        return hybrid_fn(vae_params, cnn_variables, W, mean, std, threshold, key=key)

    return run


def make_dp_hybrid_shardmap(vae_model, cnn_model, mesh: Mesh, axis: str = "data",
                            **hybrid_kwargs):
    """SPMD hybrid inference via shard_map: each device runs the full
    gate->attribute pipeline on its batch shard. Unlike jit auto-partitioning,
    this also works when the VAE pass is a Pallas kernel (``use_fused_vae=True``)
    — custom calls aren't auto-partitionable, but inside shard_map each device
    executes its own kernel instance. Deterministic path only (no sampling key).
    """
    from shm_tpu.pipeline import make_hybrid_fn

    inner = make_hybrid_fn(vae_model, cnn_model, **hybrid_kwargs)

    def local(vp, cv, W, mean, std, thr):
        return inner(vp, cv, W, mean, std, thr)

    sm = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sm)


__all__ = [
    "make_mesh",
    "make_mesh_opt",
    "shard_batch",
    "replicate",
    "make_dp_vae_train_step",
    "make_dp_cnn_train_step",
    "make_dp_hybrid_fn",
    "make_dp_hybrid_shardmap",
]
