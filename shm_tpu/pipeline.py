"""Fused hybrid gate->attribution inference — the framework's hot path.

Rebuilds the staged pipeline of 4DOF/Scripts/06_test_full_pipeline.py:327-383 and
Codes/10_test_hybrid_pipeline.py:319-453 as ONE jit-compiled device function:

reference (per batch):                     this pipeline (per batch):
  VAE pass 1  -> per-window MSE              single VAE pass -> (recon)
  host gather of anomalous windows            -> MSE (gate score)
  VAE pass 2 on anomalies -> residual         -> residual (CNN channel 2)
  CNN on anomalies                           CNN on ALL windows (masked select)
  host scatter of predictions                jnp.where on device

The reference's double VAE forward (:339-344 then :359-365) and host round-trips
disappear; anomaly routing becomes fixed-shape masked compute (jit-friendly, and on
TPU running the CNN on every window is cheaper than a dynamic gather).

Label convention: 0 = Normal, 1 = Sensor Fault, 2 = Structural Fault
(4DOF readme; CNN argmax {0,1} -> {1,2} at 06_test_full_pipeline.py:369-371).
Hybrid score = p(structural), 0 for non-anomalous windows (:372-375).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from shm_tpu.data.windows import normalize_windows
from shm_tpu.models.cnn import stack_vae_residual_nhwc


class HybridOutputs(NamedTuple):
    """Per-window device outputs of the fused pipeline."""

    mse: jax.Array        # (N,) gate reconstruction MSE
    anomalous: jax.Array  # (N,) bool gate decision (mse > threshold, strict)
    y_pred: jax.Array     # (N,) int32 in {0, 1, 2}
    p_struct: jax.Array   # (N,) hybrid score = p(structural | anomalous) else 0
    logits: jax.Array     # (N, 2) raw CNN logits (diagnostics)


def make_hybrid_fn(vae_model, cnn_model, *, sample: bool = False,
                   use_fused_vae: bool = False, fused_dtype=None,
                   fused_interpret: bool = False, fused_layout: str = "nhwc",
                   fused_batch_tile: int = 256):
    """Build the jitted fused gate->attribute function.

    Returns ``fn(vae_params, cnn_variables, W, mean, std, threshold, key=None)``
    where ``W`` is a raw (N, T, D) window stack. With ``sample=True`` the VAE
    reconstruction draws z ~ q(z|x) per the reference's stochastic eval; default
    decodes the posterior mean.

    ``use_fused_vae=True`` routes the deterministic VAE pass through the Pallas
    kernel (shm_tpu.ops.fused_vae) — one VMEM-resident pass producing (mse,
    residual) directly; only valid with ``sample=False`` and 1- or 2-layer
    presets (``fused_vae_gate`` supports both; HybridScorer auto-selects it
    for ``num_layers in (1, 2)``).

    ``fused_layout="transposed"`` (with ``use_fused_vae=True``, CNN4DOF-shaped
    models only) keeps the VAE residual in the kernel's native batch-in-lanes
    ``[T, Dp, Np]`` tile and runs the attribution CNN in that layout
    (:func:`shm_tpu.models.cnn.cnn4dof_apply_transposed`) — eliminating the
    residual transpose and the ``stack([Z, resid])`` materialization of the
    reference hot path (06_test_full_pipeline.py:339-371). Identical outputs
    (tests/test_ops.py), but MEASURED NEGATIVE on v5e: 100k vs 159k win/s
    end-to-end, 140k vs 353k device-side (tools/probe_attr_fusion.py,
    round 3, trained artifacts, same-process A/B) — the batch-in-lanes conv
    matmuls ([cout<=32, k*k*cin] x [k*k*cin, spatial*batch]) underfill the
    MXU far more than the layout passes they save. Kept as the documented
    negative result; do NOT enable for production scoring.
    """
    if use_fused_vae and sample:
        raise ValueError("fused VAE kernel is deterministic (sample=False only)")
    cell = getattr(vae_model, "cell", "lstm")
    if use_fused_vae and cell not in ("lstm", "min_gru", "attention"):
        raise ValueError(f"no fused kernel for cell={cell!r}")
    if fused_layout == "transposed" and cell != "lstm":
        raise ValueError("fused_layout='transposed' is LSTM-kernel only")
    if fused_layout not in ("nhwc", "transposed"):
        raise ValueError(f"unknown fused_layout {fused_layout!r}")
    if fused_layout == "transposed" and not use_fused_vae:
        raise ValueError("fused_layout='transposed' requires use_fused_vae=True")

    @partial(jax.jit, static_argnames=())
    def hybrid(vae_params, cnn_variables, W, mean, std, threshold, key=None):
        Z = normalize_windows(W, mean, std)
        if use_fused_vae and fused_layout == "transposed":
            from shm_tpu.models.cnn import cnn4dof_apply_transposed
            from shm_tpu.ops import fused_vae_gate

            N, T, D = Z.shape
            mse, resid_t = fused_vae_gate(
                vae_params, Z,
                num_layers=vae_model.num_layers,
                use_layernorm=vae_model.use_layernorm,
                dtype=fused_dtype or vae_model.dtype,
                interpret=fused_interpret,
                batch_tile=fused_batch_tile,
                residual_layout="transposed",
            )
            # Zt built EXACTLY like the kernel's internal input transpose —
            # inlined into the same jit program, XLA CSEs the two
            Dp, Np = resid_t.shape[1], resid_t.shape[2]
            Zp = jnp.pad(Z, ((0, Np - N), (0, 0), (0, Dp - D)))
            Zt = jnp.transpose(Zp, (1, 2, 0)).astype(resid_t.dtype)
            logits = cnn4dof_apply_transposed(
                cnn_variables, Zt, resid_t, d_real=D,
                dtype=fused_dtype or jnp.bfloat16)[:N]
        elif use_fused_vae:
            if cell == "attention":
                from shm_tpu.ops import fused_attention_gate

                # per-window rows are Tp-padded in VMEM, so the attention
                # kernel tiles windows far smaller than the recurrent ones.
                # io follows the compute dtype (bf16 in production): halves
                # the x/residual HBM tiles — measured +2% hybrid same-
                # process with 100.0000% gate AND y_pred agreement vs the
                # XLA f32 path on the trained artifacts (round 5,
                # BENCHMARKS.md).
                mse, resid = fused_attention_gate(
                    vae_params, Z,
                    num_layers=vae_model.num_layers,
                    use_layernorm=vae_model.use_layernorm,
                    dtype=fused_dtype or vae_model.dtype,
                    io_dtype=(fused_dtype
                              if not fused_interpret else None),
                    interpret=fused_interpret,
                    emulate=fused_interpret,
                    batch_tile=min(fused_batch_tile, 16)
                    if not fused_interpret else fused_batch_tile,
                )
                resid = resid.astype(Z.dtype)
            elif cell == "min_gru":
                from shm_tpu.ops import fused_mingru_gate

                mse, resid = fused_mingru_gate(
                    vae_params, Z,
                    num_layers=vae_model.num_layers,
                    use_layernorm=vae_model.use_layernorm,
                    dtype=fused_dtype or vae_model.dtype,
                    interpret=fused_interpret,
                    emulate=fused_interpret,
                    batch_tile=min(fused_batch_tile, 128)
                    if not fused_interpret else fused_batch_tile,
                )
            else:
                from shm_tpu.ops import fused_vae_gate

                mse, resid = fused_vae_gate(
                    vae_params, Z,
                    num_layers=vae_model.num_layers,
                    use_layernorm=vae_model.use_layernorm,
                    dtype=fused_dtype or vae_model.dtype,
                    interpret=fused_interpret,
                    batch_tile=fused_batch_tile,
                )
            xin = jnp.stack([Z, resid], axis=-1)
        else:
            rngs = {"reparam": key} if sample else {}
            recon, mu, logvar = vae_model.apply(
                {"params": vae_params}, Z, sample=sample, rngs=rngs
            )
            err2 = (Z - recon) ** 2
            mse = err2.mean(axis=(1, 2))
            xin = stack_vae_residual_nhwc(Z, recon)    # (N, T, D, 2)

        anom = mse > threshold                     # strict >, :350
        if not (use_fused_vae and fused_layout == "transposed"):
            logits = cnn_model.apply(cnn_variables, xin, train=False)
        cls01 = jnp.argmax(logits, axis=1).astype(jnp.int32)
        probs = jax.nn.softmax(logits, axis=1)

        y_pred = jnp.where(anom, cls01 + 1, 0)
        p_struct = jnp.where(anom, probs[:, 1], 0.0)
        return HybridOutputs(mse=mse, anomalous=anom, y_pred=y_pred,
                             p_struct=p_struct, logits=logits)

    return hybrid


def run_hybrid_batched(
    hybrid_fn,
    vae_params,
    cnn_variables,
    W: np.ndarray,
    mean,
    std,
    threshold: float,
    *,
    batch_size: int = 8192,
    key: Optional[jax.Array] = None,
) -> Dict[str, np.ndarray]:
    """Host wrapper: run the fused pipeline over a large window stack in padded
    fixed-shape batches and return NumPy arrays."""
    N = W.shape[0]
    if N == 0:
        return {k: np.zeros((0,), np.float32) for k in
                ("mse", "anomalous", "y_pred", "p_struct")}
    bs = min(batch_size, N)
    nb = -(-N // bs)
    pad = nb * bs - N
    Wp = np.concatenate([W, np.zeros((pad,) + W.shape[1:], W.dtype)]) if pad else W
    mean = jnp.asarray(mean)
    std = jnp.asarray(std)
    thr = jnp.float32(threshold)

    outs = []
    for i in range(nb):
        k = None if key is None else jax.random.fold_in(key, i)
        o = hybrid_fn(vae_params, cnn_variables,
                      jnp.asarray(Wp[i * bs:(i + 1) * bs]), mean, std, thr,
                      key=k)
        outs.append((o, bs if i < nb - 1 else bs - pad))
    return concat_hybrid_outputs(outs)


def concat_hybrid_outputs(outs) -> Dict[str, np.ndarray]:
    """Concatenate per-dispatch ``HybridOutputs`` into host arrays, trimming
    each dispatch to its un-padded window count.

    ``outs`` is a sequence of ``(HybridOutputs, n_real_windows)`` pairs. The
    ONE epilogue shared by every padded-batch driver (``run_hybrid_batched``,
    ``HybridScorer.score``/``score_series``) so the output key set and the
    trim policy cannot drift between them.
    """
    cat = lambda f: np.concatenate([np.asarray(f(o))[:n] for o, n in outs])
    return {
        "mse": cat(lambda o: o.mse),
        "anomalous": cat(lambda o: o.anomalous),
        "y_pred": cat(lambda o: o.y_pred),
        "p_struct": cat(lambda o: o.p_struct),
    }


__all__ = ["HybridOutputs", "make_hybrid_fn", "run_hybrid_batched",
           "concat_hybrid_outputs"]
