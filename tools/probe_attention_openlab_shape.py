"""Probe: fused attention kernel at the openLAB shape (T=200, H=64) on chip.

The head-packed kernel's 4DOF shape (T=100, H=128, 2 layers) is certified on
the trained artifacts (tools/probe_attention_kernel.py: 100% gate/hybrid
agreement, +45%/+36%). The openLAB preset differs in every packing-relevant
dimension — Tp=256 (two sublane blocks per window), H=64 (half-width lanes,
2 heads), 1 layer — and `auto_fused_gate` routes openLAB attention scorers
through it (serve_openlab._gate_mse), so this certifies that shape compiled
on real hardware too, on the committed REAL bridge windows:

  - kernel bf16 vs XLA f32 gate: rel err + decision agreement at the
    median-MSE boundary (random-init attention params — no trained openLAB
    attention artifacts are committed; agreement is value-independent)
  - gate-only throughput at the full 6,432-window bridge batch: XLA bf16
    vs kernel (same-process)

Run: PYTHONPATH=/root/repo:/root/.axon_site \
         python tools/probe_attention_openlab_shape.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, *args, repeats=10):
    float(np.asarray(fn(*args)).sum())
    t0 = time.perf_counter()
    for _ in range(repeats):
        float(np.asarray(fn(*args)).sum())
    return (time.perf_counter() - t0) / repeats


def main() -> None:
    sys.path.insert(0, ".")
    from dataclasses import replace
    from pathlib import Path

    from shm_tpu.cli.openlab import Paths, _load_openlab_vae, standardize_clip
    from shm_tpu.config import OpenLabConfig
    from shm_tpu.models.vae import vae_from_config
    from shm_tpu.ops import fused_attention_gate

    cfg = OpenLabConfig()
    root = Path("data/openlab")

    # real bridge windows, standardized with the committed gate stats over
    # the manifest's channel subset (the serving gate's exact input)
    print("loading committed bridge windows...", flush=True)
    _, _, mu, sd, manifest = _load_openlab_vae(Paths(str(root), raw_dir=""),
                                               cfg)
    Xc = np.load(root / "extracted" / "X_clean.npy").astype(np.float32)
    Z_host = standardize_clip(Xc[:, :, manifest["channels_idx"]], mu, sd,
                              cfg.standardize_clip)
    N, T, D = Z_host.shape
    print(f"windows {Z_host.shape}", flush=True)

    model = vae_from_config(replace(cfg.vae, cell="attention", dropout=0.0))
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((2, T, D), jnp.float32))["params"]
    Z = jax.device_put(jnp.asarray(Z_host))
    float(np.asarray(Z).sum())

    @jax.jit
    def xla_gate_f32(p, Zb):
        recon, _, _ = model.apply({"params": p}, Zb, sample=False)
        return ((Zb - recon) ** 2).mean(axis=(1, 2))

    print("compiling XLA f32 gate...", flush=True)
    mse_x = np.asarray(xla_gate_f32(params, Z))

    print("compiling kernel gate (Tp=256, H=64, 2 heads, 1 layer)...",
          flush=True)
    kern = jax.jit(lambda p, Zb: fused_attention_gate(
        p, Zb, num_layers=model.num_layers,
        use_layernorm=model.use_layernorm, with_residual=False,
        io_dtype=jnp.bfloat16)[0])
    mse_k = np.asarray(kern(params, Z))

    rel = np.abs(mse_k - mse_x) / np.maximum(np.abs(mse_x), 1e-8)
    thr = float(np.median(mse_x))   # balanced boundary for random params
    agree = float(np.mean((mse_k > thr) == (mse_x > thr)))
    print(f"gate mse rel err: max {rel.max():.3e} mean {rel.mean():.3e}",
          flush=True)
    print(f"decision agreement at median-MSE boundary: {agree:.4%}",
          flush=True)

    @jax.jit
    def xla_gate_bf16(p, Zb):
        m = vae_from_config(replace(cfg.vae, cell="attention", dropout=0.0),
                            dtype=jnp.bfloat16)
        recon, _, _ = m.apply({"params": p}, Zb, sample=False)
        return ((Zb - recon) ** 2).mean(axis=(1, 2))

    print("\n-- gate-only throughput (win/s, full bridge batch) --",
          flush=True)
    dt = timed(xla_gate_bf16, params, Z)
    print(f"{'attention XLA bf16':26s} {N/dt:10.0f}", flush=True)
    dt = timed(kern, params, Z)
    print(f"{'attention kernel bf16':26s} {N/dt:10.0f}", flush=True)


if __name__ == "__main__":
    main()
