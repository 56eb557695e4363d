"""Probe: attention (transformer) gate vs the LSTM Pallas kernel (round 3).

BENCHMARKS.md closed the LSTM gate kernel at its transcendental floor
(~22% MFU) and the minGRU preset at ~629k win/s (its sequential T-loop and
VMEM I/O bound). The attention preset (shm_tpu/models/attention.py,
VAEConfig(cell="attention")) removes the time recurrence entirely — every
op is a batched matmul (QKV/out projections, [T,T] attention, MLP) that
tiles straight onto the MXU, with no fused kernel needed: this probe
measures whether the plain XLA lowering already clears the recurrent
families' ceilings.

MEASURED ANSWER (real chip, 2026-08-19): NO — decisively. Device-side 4x
gate-only 98k (bf16) / 66k (f32) win/s vs the LSTM kernel's 476k; hybrid
96k vs 406k. At B*T ~ 2M tokens every inter-op [B, T, H] activation is
~0.5 GB, so the un-fused op chain is HBM-bandwidth-bound (~2.2x the LSTM
FLOPs at <9% MFU). The preset's value is QUALITY (best 4DOF accuracy of
the three families, 0.9948) and architectural diversity, not throughput;
full discussion in BENCHMARKS.md and models/attention.py.

Measures, same-process, on the 4DOF gate shapes (T=100, D=12, H=128,
2 layers, 4 heads):

  - LSTM fused Pallas kernel, gate-only + fused hybrid (shipping refs)
  - attention gate-only: XLA, {f32, bf16}
  - attention full hybrid: XLA {f32, bf16} (CNN via native lax.conv)

Attention params are randomly initialized — throughput does not depend on
the values; the quality story is measured separately by training the preset
(BENCHMARKS.md round 3). Timing: pre-computed device-resident inputs, one
jitted call + host readback per repeat (no eager math inside the timed
lambda — see CLAUDE.md probe pitfalls).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_attention.py
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


def attn_vae(dtype):
    from shm_tpu.models import TemporalVAE

    return TemporalVAE(input_dim=12, latent_dim=16, hidden_dim=128,
                       num_layers=2, dropout=0.3, use_layernorm=True,
                       dtype=dtype, cell="attention")


def main() -> None:
    import sys

    sys.path.insert(0, ".")
    from bench import load_trained_workload
    from shm_tpu.models.cnn import inference_conv_impl  # noqa: F401 (doc)
    from shm_tpu.ops import fused_vae_gate
    from shm_tpu.pipeline import make_hybrid_fn

    vae, cnn, vae_params, cnn_vars, W, mean, std, thr = load_trained_workload()
    vae_params = jax.device_put(vae_params)
    cnn_vars = jax.device_put(cnn_vars)
    mean, std = jnp.asarray(mean), jnp.asarray(std)
    thrj = jnp.float32(thr)

    reps = -(-5440 // W.shape[0])
    W = np.concatenate([W] * reps)[:5440].astype(np.float32)

    at_params = jax.device_put(attn_vae(jnp.float32).init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, 100, 12), jnp.float32))["params"])

    def make_gate(model):
        @jax.jit
        def gate(p, Z):
            recon, _, _ = model.apply({"params": p}, Z)
            return ((Z - recon) ** 2).mean(axis=(1, 2))
        return gate

    at_gates = {dn: make_gate(attn_vae(dt))
                for dn, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16))}

    lstm_gate = jax.jit(lambda p, Z: fused_vae_gate(
        p, Z, num_layers=2, use_layernorm=True, with_residual=False,
        io_dtype=jnp.bfloat16)[0])

    # bf16-vs-f32 agreement on the same random params (numerics sanity; the
    # structural correctness pins are tests/test_attention.py)
    Zs = jax.device_put((jnp.asarray(W[:1024]) - mean) / std)
    mse_b = np.asarray(at_gates["bf16"](at_params, Zs), np.float32)
    mse_f = np.asarray(at_gates["f32"](at_params, Zs))
    rel = np.max(np.abs(mse_b - mse_f) / (np.abs(mse_f) + 1e-6))
    print(f"attention bf16 vs f32 gate mse: max rel diff {rel:.3e}", flush=True)

    lstm_hybrid = make_hybrid_fn(vae, cnn, use_fused_vae=True,
                                 fused_dtype=jnp.bfloat16)
    at_hybrids = {dn: make_hybrid_fn(attn_vae(dt), cnn)
                  for dn, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16))}

    for tag, n_rep, mult in (("end-to-end 5440", 20, 1),
                             ("device-side 4x (21760)", 8, 4)):
        Wn = np.concatenate([W] * mult)
        N = Wn.shape[0]
        Wd = jax.device_put(jnp.asarray(Wn))
        Zd = jax.device_put((jnp.asarray(Wn) - mean) / std)
        jax.block_until_ready((Wd, Zd))

        t = timed(lstm_gate, vae_params, Zd, repeats=n_rep)
        print(f"[{tag}] LSTM pallas gate-only: {N/t:,.0f} win/s", flush=True)
        for name, fn in at_gates.items():
            t = timed(fn, at_params, Zd, repeats=n_rep)
            print(f"[{tag}] attention gate XLA {name}: {N/t:,.0f} win/s",
                  flush=True)
        t = timed(lambda: lstm_hybrid(vae_params, cnn_vars, Wd, mean, std,
                                      thrj), repeats=n_rep)
        print(f"[{tag}] LSTM fused hybrid (shipping): {N/t:,.0f} win/s",
              flush=True)
        for name, fn in at_hybrids.items():
            t = timed(lambda fn=fn: fn(at_params, cnn_vars, Wd, mean, std,
                                       thrj), repeats=n_rep)
            print(f"[{tag}] attention hybrid XLA {name}: {N/t:,.0f} win/s",
                  flush=True)


if __name__ == "__main__":
    main()
