"""Probe: fused attention Pallas kernel vs the XLA attention gate (round 3).

probe_attention.py measured the attention preset's XLA lowering ~5x below
the LSTM kernel (98k vs 476k win/s device-side gate-only) and diagnosed it
HBM-bandwidth-bound. The head-packed VMEM-resident kernel
(shm_tpu/ops/fused_attention.py) attacks exactly that: this probe measures,
same-process, on the TRAINED 4DOF attention artifacts
(data/4dof_attention) and the committed real test windows:

  - gate agreement at the deployed threshold: XLA-f32 (the shipping scoring
    path) vs the bf16 kernel, plus hybrid y_pred agreement end-to-end
  - gate-only throughput: XLA bf16 (best pre-kernel path) vs the kernel at
    batch_tile {8, 16, 32} x io {f32, bf16}
  - full hybrid throughput: XLA vs fused-kernel pipeline
  - the LSTM fused kernel, same process (the family reference point)

Timing: pre-computed device-resident inputs, one jitted call + host
readback per repeat (CLAUDE.md probe pitfalls).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_attention_kernel.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, *args, repeats=20):
    def readback(out):
        first = out[0] if isinstance(out, tuple) else out
        mse = getattr(first, "mse", first)
        float(np.asarray(mse).sum())

    readback(fn(*args))
    t0 = time.perf_counter()
    for _ in range(repeats):
        readback(fn(*args))
    return (time.perf_counter() - t0) / repeats


def main() -> None:
    sys.path.insert(0, ".")
    from pathlib import Path

    from bench import load_trained_workload
    from shm_tpu.cli.stage4dof import Paths, _load_stats, _load_vae
    from shm_tpu.config import Stage4DofConfig
    from shm_tpu.ops import fused_attention_gate, fused_vae_gate
    from shm_tpu.pipeline import make_hybrid_fn
    from shm_tpu.utils.io import load_json

    # LSTM artifacts + the real test windows (raw trees are byte-identical
    # between data/4dof and data/4dof_attention — BENCHMARKS.md)
    print("loading artifacts/windows...", flush=True)
    vae_l, cnn, vae_l_params, cnn_vars, W, mean_l, std_l, thr_l = (
        load_trained_workload())
    reps = -(-5440 // W.shape[0])
    W = np.concatenate([W] * reps)[:5440].astype(np.float32)

    root = Path("data/4dof_attention")
    paths = Paths(str(root))
    cfg = Stage4DofConfig()
    mean, std = _load_stats(paths)
    vae_a, vae_a_params = _load_vae(paths, cfg)
    assert vae_a.cell == "attention", vae_a.cell
    thr = float(load_json(paths.processed / "vae_threshold.json")["threshold"])
    vae_a_params = jax.device_put(vae_a_params)
    cnn_vars = jax.device_put(cnn_vars)
    meanj, stdj = jnp.asarray(mean), jnp.asarray(std)
    thrj = jnp.float32(thr)

    print("normalizing on device (first dispatch)...", flush=True)
    Z = jax.device_put((jnp.asarray(W) - meanj) / stdj)
    float(np.asarray(Z).sum())
    print("device ready; compiling XLA f32 gate...", flush=True)

    # ---- correctness on the deployed artifacts ----
    from shm_tpu.models import TemporalVAE

    def attn_model(dtype):
        return TemporalVAE(input_dim=12, latent_dim=16, hidden_dim=128,
                           num_layers=2, dropout=0.3, use_layernorm=True,
                           dtype=dtype, cell="attention")

    @jax.jit
    def xla_gate_f32(p, Zb):
        recon, _, _ = attn_model(jnp.float32).apply({"params": p}, Zb)
        return ((Zb - recon) ** 2).mean(axis=(1, 2))

    mse_x = np.asarray(xla_gate_f32(vae_a_params, Z))
    print("compiling kernel gate...", flush=True)
    kern_gate = jax.jit(lambda p, Zb: fused_attention_gate(
        p, Zb, num_layers=2, use_layernorm=True, with_residual=False,
        io_dtype=jnp.bfloat16)[0])
    mse_k = np.asarray(kern_gate(vae_a_params, Z))
    rel = np.abs(mse_k - mse_x) / np.maximum(np.abs(mse_x), 1e-8)
    agree = float(np.mean((mse_k > thr) == (mse_x > thr)))
    print(f"gate mse rel err: max {rel.max():.3e} mean {rel.mean():.3e}",
          flush=True)
    print(f"gate decision agreement at thr={thr:.4f}: {agree:.4%}", flush=True)

    xla_hybrid = make_hybrid_fn(attn_model(jnp.bfloat16), cnn)
    kern_hybrid = make_hybrid_fn(attn_model(jnp.bfloat16), cnn,
                                 use_fused_vae=True, fused_dtype=jnp.bfloat16)
    out_x = xla_hybrid(vae_a_params, cnn_vars, jnp.asarray(W), meanj, stdj,
                       thrj)
    out_k = kern_hybrid(vae_a_params, cnn_vars, jnp.asarray(W), meanj, stdj,
                        thrj)
    ya, yk = np.asarray(out_x.y_pred), np.asarray(out_k.y_pred)
    print(f"hybrid y_pred agreement (kernel vs XLA-bf16): "
          f"{float(np.mean(ya == yk)):.4%}", flush=True)

    # ---- throughput (5440 windows, device-resident input) ----
    N = W.shape[0]

    @jax.jit
    def xla_gate_bf16(p, Zb):
        recon, _, _ = attn_model(jnp.bfloat16).apply({"params": p}, Zb)
        return ((Zb - recon) ** 2).mean(axis=(1, 2))

    print("\n-- gate-only (win/s, device-resident normalized input) --",
          flush=True)
    for name, fn in [("attention XLA bf16", xla_gate_bf16)]:
        dt = timed(fn, vae_a_params, Z)
        print(f"{name:34s} {N/dt:10.0f}", flush=True)
    for bt in (8, 16, 32):
        for io_name, io in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
            fn = jax.jit(lambda p, Zb, bt=bt, io=io: fused_attention_gate(
                p, Zb, num_layers=2, use_layernorm=True, with_residual=False,
                batch_tile=bt, io_dtype=io)[0])
            try:
                dt = timed(fn, vae_a_params, Z)
                print(f"attention kernel bt={bt:<3d} io={io_name:4s}     "
                      f"{N/dt:10.0f}", flush=True)
            except Exception as e:  # noqa: BLE001 — VMEM overflow is data
                print(f"attention kernel bt={bt:<3d} io={io_name:4s}     "
                      f"FAILED: {type(e).__name__}", flush=True)

    lstm_gate = jax.jit(lambda p, Zb: fused_vae_gate(
        p, Zb, num_layers=2, use_layernorm=True, with_residual=False,
        io_dtype=jnp.bfloat16)[0])
    dt = timed(lstm_gate, jax.device_put(vae_l_params), Z)
    print(f"{'LSTM kernel (reference)':34s} {N/dt:10.0f}", flush=True)

    print("\n-- full hybrid (win/s, raw windows on device) --", flush=True)
    Wd = jax.device_put(jnp.asarray(W))
    float(np.asarray(Wd).sum())
    for name, fn, vp in (("attention XLA bf16", xla_hybrid, vae_a_params),
                         ("attention kernel", kern_hybrid, vae_a_params)):
        dt = timed(fn, vp, cnn_vars, Wd, meanj, stdj, thrj)
        print(f"{name:34s} {N/dt:10.0f}", flush=True)

    lstm_hybrid = make_hybrid_fn(vae_l, cnn, use_fused_vae=True,
                                 fused_dtype=jnp.bfloat16)
    dt = timed(lstm_hybrid, jax.device_put(vae_l_params), cnn_vars, Wd,
               jnp.asarray(mean_l), jnp.asarray(std_l), jnp.float32(thr_l))
    print(f"{'LSTM kernel hybrid (reference)':34s} {N/dt:10.0f}", flush=True)


if __name__ == "__main__":
    main()
