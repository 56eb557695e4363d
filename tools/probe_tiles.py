"""Device-side tile study for the fused VAE kernel (round-2 perf pass).

The end-to-end 5,440-window workload is ~75% remote-dispatch floor, so tile
choices look flat there (BENCHMARKS.md round-1 study). This probe measures the
4x workload (21,760 windows) where device time dominates, across batch tiles
and residual modes, on the TRAINED artifacts — the honest device-side number
that sets `bench.py`'s device_mfu.

Prints one JSON line per configuration. TPU only.
"""

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


def _rate(fn, W, n) -> float:
    out = fn(W)
    float(np.asarray(out).sum())             # force completion (readback)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(W)
        float(np.asarray(out).sum())
    dt = (time.perf_counter() - t0) / REPS
    return n / dt


def main() -> None:
    from bench import (load_trained_workload, hybrid_flops_per_window,
                       cnn_flops_per_window)

    vae, cnn, vae_params, cnn_vars, W, mean, std, thr = load_trained_workload()
    reps4 = -(-21760 // W.shape[0])
    W4 = np.concatenate([W] * reps4)[:21760].astype(np.float32)
    n = W4.shape[0]
    Wd = jax.device_put(jnp.asarray(W4))
    vae_params = jax.device_put(vae_params)
    mean_d, std_d = jnp.asarray(mean), jnp.asarray(std)

    from shm_tpu.data.windows import normalize_windows
    from shm_tpu.ops import fused_vae_gate

    Zd = normalize_windows(Wd, mean_d, std_d)
    Zd = jax.device_put(Zd)
    float(np.asarray(Zd).sum())

    fpw = hybrid_flops_per_window()
    vae_fpw = fpw - cnn_flops_per_window()

    for with_residual in (True, False):
        for bt in (256, 512, 1024):
            fn = jax.jit(lambda Z, bt=bt, wr=with_residual: fused_vae_gate(
                vae_params, Z, num_layers=2, use_layernorm=True,
                batch_tile=bt, io_dtype=jnp.bfloat16,
                with_residual=wr)[0])
            r = _rate(fn, Zd, n)
            print(json.dumps({
                "probe": "fused_vae_gate", "batch_tile": bt,
                "with_residual": with_residual, "windows": n,
                "windows_per_sec": round(r, 1),
                "vae_tflops": round(r * vae_fpw / 1e12, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
