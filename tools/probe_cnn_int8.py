"""Probe: int8 attribution CNN A/B on trained artifacts (VERDICT r4 #4).

Measures, same-process on the real chip, with the trained 4DOF artifacts
and the committed real test windows:

1. CNN-only throughput: the production attribution path (bf16 CNN4DOF,
   native lax.conv — models/cnn.py::inference_conv_impl) vs the int8 path
   (models/cnn_int8.py: float conv1 + int8 conv2/fc1/fc2 with per-sample
   dynamic activation scales), on the identical device-resident [Z,
   residual^2] stack the hybrid produces.
2. Full-hybrid throughput: the shipping fused-VAE + bf16-CNN pipeline vs
   the same gate with the int8 attribution stage.
3. The ship/no-ship agreement gate: 3-class y_pred agreement on all 5,440
   real windows must be >= 99.9% for the int8 path to be considered.

Timing: device-resident inputs, one jitted call + host readback per repeat
(CLAUDE.md probe pitfalls). 4x workload to amortize the dispatch floor.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_cnn_int8.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

REPEATS = 20


def timed(fn, *args, repeats=REPEATS):
    def readback(out):
        first = out[0] if isinstance(out, tuple) else out
        arr = getattr(first, "mse", first)
        float(np.asarray(arr).sum())

    readback(fn(*args))
    t0 = time.perf_counter()
    for _ in range(repeats):
        readback(fn(*args))
    return (time.perf_counter() - t0) / repeats


def main() -> None:
    sys.path.insert(0, ".")
    from bench import load_trained_workload
    from shm_tpu.models.cnn_int8 import cnn4dof_int8_apply, quantize_cnn4dof
    from shm_tpu.data.windows import normalize_windows
    from shm_tpu.ops import fused_vae_gate
    from shm_tpu.pipeline import make_hybrid_fn

    print("loading artifacts/windows...", flush=True)
    vae, cnn, vae_params, cnn_vars, W, mean, std, thr = load_trained_workload()
    N = W.shape[0]
    print(f"windows: {W.shape}, threshold {thr:.4f}", flush=True)

    meanj, stdj = jnp.asarray(mean), jnp.asarray(std)
    vae_params = jax.device_put(vae_params)
    cnn_vars = jax.device_put(cnn_vars)

    # the hybrid's CNN input stack, produced once by the fused VAE gate
    Z = normalize_windows(jnp.asarray(W), meanj, stdj)
    mse, resid = fused_vae_gate(vae_params, Z, num_layers=2,
                                use_layernorm=True, dtype=jnp.bfloat16)
    xin = jnp.stack([Z, resid], axis=-1)              # [N, T, D, 2] f32
    xin4 = jnp.concatenate([xin] * 4)
    jax.block_until_ready(xin4)
    N4 = int(xin4.shape[0])

    q = jax.device_put(quantize_cnn4dof(jax.tree.map(np.asarray, cnn_vars)))

    # ---- CNN-only A/B ----
    bf16_fn = jax.jit(lambda v, x: cnn.apply(v, x, train=False))
    int8_fn = jax.jit(cnn4dof_int8_apply)
    dt_b = timed(bf16_fn, cnn_vars, xin4)
    dt_i = timed(int8_fn, q, xin4)
    print(f"\nCNN-only (4x = {N4} windows):")
    print(f"  bf16 lax.conv : {dt_b*1e3:7.2f} ms  {N4/dt_b/1e3:7.1f}k win/s")
    print(f"  int8          : {dt_i*1e3:7.2f} ms  {N4/dt_i/1e3:7.1f}k win/s "
          f"({dt_b/dt_i:.2f}x)")

    # ---- logits agreement on the real 5,440 stack ----
    lb = np.asarray(bf16_fn(cnn_vars, xin))
    li = np.asarray(int8_fn(q, xin))
    cls_agree = float((lb.argmax(1) == li.argmax(1)).mean())
    print(f"  class argmax agreement: {cls_agree*100:.4f}%")

    # ---- full hybrid A/B ----
    prod = make_hybrid_fn(vae, cnn, use_fused_vae=True,
                          fused_dtype=jnp.bfloat16)

    @jax.jit
    def hybrid_int8(vp, qq, Wb, mn, sd, th):
        Zb = normalize_windows(Wb, mn, sd)
        ms, rs = fused_vae_gate(vp, Zb, num_layers=2, use_layernorm=True,
                                dtype=jnp.bfloat16)
        logits = cnn4dof_int8_apply(qq, jnp.stack([Zb, rs], axis=-1))
        anom = ms > th
        cls01 = jnp.argmax(logits, axis=1).astype(jnp.int32)
        return ms, jnp.where(anom, cls01 + 1, 0)

    W4 = jnp.asarray(np.concatenate([W] * 4))
    jax.block_until_ready(W4)
    dt_p = timed(prod, vae_params, cnn_vars, W4, meanj, stdj,
                 jnp.float32(thr))
    dt_q = timed(hybrid_int8, vae_params, q, W4, meanj, stdj,
                 jnp.float32(thr))
    print(f"\nfull hybrid (4x, device-resident):")
    print(f"  bf16 CNN : {dt_p*1e3:7.2f} ms  {N4/dt_p/1e3:7.1f}k win/s")
    print(f"  int8 CNN : {dt_q*1e3:7.2f} ms  {N4/dt_q/1e3:7.1f}k win/s "
          f"({dt_p/dt_q:.2f}x)")

    out_p = prod(vae_params, cnn_vars, jnp.asarray(W), meanj, stdj,
                 jnp.float32(thr))
    _, yq = hybrid_int8(vae_params, q, jnp.asarray(W), meanj, stdj,
                        jnp.float32(thr))
    yp = np.asarray(out_p.y_pred)
    agree = float((yp == np.asarray(yq)).mean())
    print(f"  y_pred agreement on {N} real windows: {agree*100:.4f}% "
          f"({'PASSES' if agree >= 0.999 else 'FAILS'} the 99.9% bar)")


if __name__ == "__main__":
    main()
