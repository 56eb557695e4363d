"""Measure the layer-skewed fused kernel vs the stacked form on the 4x
workload (device-bound). TPU only; prints one JSON line per config."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPS = 10


def _rate(fn, Z, n) -> float:
    out = fn(Z)
    float(np.asarray(out).sum())
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(Z)
        float(np.asarray(out).sum())
    return n / ((time.perf_counter() - t0) / REPS)


def main() -> None:
    from bench import (load_trained_workload, hybrid_flops_per_window,
                       cnn_flops_per_window)

    vae, cnn, vae_params, cnn_vars, W, mean, std, thr = load_trained_workload()
    W4 = np.concatenate([W] * (-(-21760 // W.shape[0])))[:21760].astype(np.float32)
    n = W4.shape[0]
    vae_params = jax.device_put(vae_params)

    from shm_tpu.data.windows import normalize_windows
    from shm_tpu.ops import fused_vae_gate

    Zd = jax.device_put(normalize_windows(jnp.asarray(W4), jnp.asarray(mean),
                                          jnp.asarray(std)))
    float(np.asarray(Zd).sum())

    fpw = hybrid_flops_per_window()
    vae_fpw = fpw - cnn_flops_per_window()

    for with_residual in (True, False):
        for skew in (False, True):
            fn = jax.jit(lambda Z, s=skew, wr=with_residual: fused_vae_gate(
                vae_params, Z, num_layers=2, use_layernorm=True,
                batch_tile=256, io_dtype=jnp.bfloat16,
                with_residual=wr, skew=s)[0])
            r = _rate(fn, Zd, n)
            print(json.dumps({
                "probe": "fused_vae_gate", "skew": skew,
                "with_residual": with_residual, "windows": n,
                "windows_per_sec": round(r, 1),
                "vae_tflops": round(r * vae_fpw / 1e12, 2),
                "vae_mfu_bf16": round(r * vae_fpw / 197e12, 4),
            }), flush=True)


if __name__ == "__main__":
    main()
