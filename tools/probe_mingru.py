"""Probe: minGRU parallel-scan gate vs the LSTM Pallas kernel (ROADMAP r3 #2).

BENCHMARKS.md closed the LSTM gate as a kernel problem (~22% MFU, 5
transcendentals per cell-step = the structural floor for that recurrence);
the one move left is a different recurrence. The minGRU preset
(shm_tpu/models/minrnn.py, VAEConfig(cell="min_gru")) removes the recurrent
matmul entirely and reduces the time dimension to an elementwise linear scan,
so the whole forward is batched MXU projections + one [B,T,H] sigmoid + a
multiply-add chain.

This probe measures, same-process, on the 4DOF gate shapes (T=100, D=12,
H=128, 2 layers):

  - LSTM fused Pallas kernel, gate-only (the shipping ~520k win/s path)
  - minGRU gate-only: XLA, {sequential, associative} scan x {f32, bf16}
  - minGRU full hybrid (XLA) vs LSTM fused hybrid (shipping)

minGRU params are randomly initialized — throughput does not depend on the
values; the quality story is measured separately by training the preset
(BENCHMARKS.md round 3). Timing: pre-computed device-resident inputs, one
jitted call + host readback per repeat (no eager math inside the timed
lambda — see CLAUDE.md probe pitfalls).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_mingru.py
"""

from __future__ import annotations

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


def mingru_vae(dtype, scan_impl):
    from shm_tpu.models import TemporalVAE

    return TemporalVAE(input_dim=12, latent_dim=16, hidden_dim=128,
                       num_layers=2, dropout=0.3, use_layernorm=True,
                       dtype=dtype, cell="min_gru", scan_impl=scan_impl)


def main() -> None:
    import sys

    sys.path.insert(0, ".")
    from bench import load_trained_workload
    from shm_tpu.ops import fused_vae_gate
    from shm_tpu.pipeline import make_hybrid_fn

    vae, cnn, vae_params, cnn_vars, W, mean, std, thr = load_trained_workload()
    vae_params = jax.device_put(vae_params)
    cnn_vars = jax.device_put(cnn_vars)
    mean, std = jnp.asarray(mean), jnp.asarray(std)
    thrj = jnp.float32(thr)

    reps = -(-5440 // W.shape[0])
    W = np.concatenate([W] * reps)[:5440].astype(np.float32)

    mg_params = jax.device_put(mingru_vae(jnp.float32, "sequential").init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, 100, 12), jnp.float32))["params"])

    def make_gate(model):
        @jax.jit
        def gate(p, Z):
            recon, _, _ = model.apply({"params": p}, Z)
            return ((Z - recon) ** 2).mean(axis=(1, 2))
        return gate

    mg_gates = {
        f"{dn}/{impl}": make_gate(mingru_vae(dt, impl))
        for dn, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16))
        for impl in ("sequential", "associative")
    }

    lstm_gate = jax.jit(lambda p, Z: fused_vae_gate(
        p, Z, num_layers=2, use_layernorm=True, with_residual=False,
        io_dtype=jnp.bfloat16)[0])

    from shm_tpu.ops import fused_mingru_gate

    mg_kernel_gate = jax.jit(lambda p, Z: fused_mingru_gate(
        p, Z, num_layers=2, use_layernorm=True, with_residual=False,
        io_dtype=jnp.bfloat16)[0])
    mg_kernel_hybrid = make_hybrid_fn(mingru_vae(jnp.bfloat16, "sequential"),
                                      cnn, use_fused_vae=True,
                                      fused_dtype=jnp.bfloat16)

    # kernel-vs-XLA agreement on the same random params (numerics sanity on
    # hardware; the exactness pin is tests/test_minrnn.py interpret mode)
    Zs = jax.device_put((jnp.asarray(W[:1024]) - mean) / std)
    mse_k = np.asarray(mg_kernel_gate(mg_params, Zs))
    mse_x = np.asarray(mg_gates["f32/sequential"](mg_params, Zs))
    rel = np.max(np.abs(mse_k - mse_x) / (np.abs(mse_x) + 1e-6))
    print(f"minGRU kernel vs XLA gate mse: max rel diff {rel:.3e}", flush=True)

    lstm_hybrid = make_hybrid_fn(vae, cnn, use_fused_vae=True,
                                 fused_dtype=jnp.bfloat16)
    mg_hybrids = {
        dn: make_hybrid_fn(mingru_vae(dt, "sequential"), cnn)
        for dn, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16))
    }

    for tag, n_rep, mult in (("end-to-end 5440", 20, 1),
                             ("device-side 4x (21760)", 8, 4)):
        Wn = np.concatenate([W] * mult)
        N = Wn.shape[0]
        Wd = jax.device_put(jnp.asarray(Wn))
        Zd = jax.device_put((jnp.asarray(Wn) - mean) / std)
        jax.block_until_ready((Wd, Zd))

        t = timed(lstm_gate, vae_params, Zd, repeats=n_rep)
        print(f"[{tag}] LSTM pallas gate-only: {N/t:,.0f} win/s", flush=True)
        t = timed(mg_kernel_gate, mg_params, Zd, repeats=n_rep)
        print(f"[{tag}] minGRU PALLAS gate-only: {N/t:,.0f} win/s", flush=True)
        for name, fn in mg_gates.items():
            t = timed(fn, mg_params, Zd, repeats=n_rep)
            print(f"[{tag}] minGRU gate {name}: {N/t:,.0f} win/s", flush=True)
        t = timed(lambda: lstm_hybrid(vae_params, cnn_vars, Wd, mean, std, thrj),
                  repeats=n_rep)
        print(f"[{tag}] LSTM fused hybrid (shipping): {N/t:,.0f} win/s",
              flush=True)
        t = timed(lambda: mg_kernel_hybrid(mg_params, cnn_vars, Wd, mean,
                                           std, thrj), repeats=n_rep)
        print(f"[{tag}] minGRU PALLAS hybrid: {N/t:,.0f} win/s", flush=True)
        for name, fn in mg_hybrids.items():
            t = timed(lambda fn=fn: fn(mg_params, cnn_vars, Wd, mean, std, thrj),
                      repeats=n_rep)
            print(f"[{tag}] minGRU hybrid XLA {name}: {N/t:,.0f} win/s",
                  flush=True)


if __name__ == "__main__":
    main()
