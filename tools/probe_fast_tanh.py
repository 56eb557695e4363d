"""Probe: can a rational tanh beat Mosaic's transcendental lowering?

Round 2 closed the LSTM gate kernel at its "transcendental floor": 5
sigmoid/tanh evaluations per cell-step on [H, Bt] blocks (BENCHMARKS.md,
tools/probe_vpu_bound.py). That diagnosis compared the exp-form vs the
tanh-form SIGMOID; it never tested whether the tanh itself can be beaten by
plain VPU arithmetic. ``fused_vae_gate(tanh_impl="rational")`` evaluates
every tanh (and the tanh-form sigmoid) as a clamped R(7,6) rational —
8 mul/FMA + 1 divide, no transcendental, max 9.7e-7 deviation from tanh
(equivalence pinned in tests/test_ops.py).

Same-process A/B on the TRAINED artifacts (the only trustworthy comparison
on this platform — cross-process variance is ~5-10%), gate-only and
with-residual, plus gate-decision agreement at the stored threshold.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_fast_tanh.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, repeats=20):
    out = fn()
    float(np.asarray(out[0]).sum())                 # force completion
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn()
        float(np.asarray(out[0]).sum())
    return (time.perf_counter() - t0) / repeats


def main() -> None:
    sys.path.insert(0, ".")
    from bench import load_trained_workload
    from shm_tpu.ops import fused_vae_gate

    loaded = load_trained_workload()
    if loaded is None:
        raise SystemExit("trained artifacts missing (data/4dof)")
    vae, _cnn, vae_params, _cnn_vars, W, mean, std, thr = loaded
    vae_params = jax.device_put(vae_params)
    mean, std = jnp.asarray(mean), jnp.asarray(std)

    reps = -(-5440 // W.shape[0])
    W = np.concatenate([W] * reps)[:5440].astype(np.float32)

    kw = dict(num_layers=vae.num_layers, use_layernorm=vae.use_layernorm,
              io_dtype=jnp.bfloat16)

    # ---- decision agreement on the real workload (shipping bf16 config) ----
    Zd = jax.device_put((jnp.asarray(W) - mean) / std)
    float(Zd.sum())
    mse_e = np.asarray(fused_vae_gate(vae_params, Zd, with_residual=False,
                                      **kw)[0])
    mse_r = np.asarray(fused_vae_gate(vae_params, Zd, with_residual=False,
                                      tanh_impl="rational", **kw)[0])
    agree = float(((mse_e > thr) == (mse_r > thr)).mean())
    rel = float(np.max(np.abs(mse_e - mse_r) / (np.abs(mse_e) + 1e-9)))
    print(f"gate-decision agreement {agree:.4f}; max rel mse diff {rel:.2e}")

    # ---- same-process A/B, end-to-end and device-dominated ----
    for tag, mult, n_rep in (("end-to-end 5440", 1, 20),
                             ("device-side 4x", 4, 6)):
        Zn = jax.device_put(jnp.concatenate([Zd] * mult)) if mult > 1 else Zd
        float(Zn.sum())                   # pre-placed: nothing eager in the
        N = Zn.shape[0]                   # timed lambdas (probe pitfalls)
        for resid in (False, True):
            t_e = timed(lambda: fused_vae_gate(
                vae_params, Zn, with_residual=resid, **kw), repeats=n_rep)
            t_r = timed(lambda: fused_vae_gate(
                vae_params, Zn, with_residual=resid, tanh_impl="rational",
                **kw), repeats=n_rep)
            lbl = "with-resid" if resid else "gate-only"
            print(f"[{tag}] {lbl}: exact {N / t_e:,.0f} win/s | "
                  f"rational {N / t_r:,.0f} win/s ({(t_e / t_r - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
