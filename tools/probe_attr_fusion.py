"""Probe: attribution-fusion A/B — does keeping the VAE residual in the
kernel's batch-in-lanes layout (no residual transpose, no stack([Z, resid])
materialization, CNN in transposed layout) beat the NHWC fused hybrid?

VERDICT r2 item 3 / "the last kernel lever": the NHWC path round-trips an
[N, T, D] residual through HBM, transposes it, materializes the stacked
2-channel CNN input, and im2cols from that. fused_layout="transposed"
(shm_tpu/pipeline.py) removes all of those layout passes.

Same-process A/B on the TRAINED artifacts (the only trustworthy comparison on
this platform — cross-process variance is ~5-10%, BENCHMARKS.md). Reports
end-to-end (5,440 windows) and device-side (4x workload) rates for:

  gate-only | nhwc hybrid (shipping r2 path) | transposed hybrid

plus output agreement between the two hybrid paths.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_attr_fusion.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, *args, repeats=20):
    out = fn(*args)
    mse = out.mse if hasattr(out, "mse") else out[0]
    float(np.asarray(mse).sum())                     # force completion
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
        mse = out.mse if hasattr(out, "mse") else out[0]
        float(np.asarray(mse).sum())
    return (time.perf_counter() - t0) / repeats


def main() -> None:
    import sys

    sys.path.insert(0, ".")
    from bench import load_trained_workload
    from shm_tpu.pipeline import make_hybrid_fn
    from shm_tpu.train.vae import reconstruction_mse

    vae, cnn, vae_params, cnn_vars, W, mean, std, thr = load_trained_workload()
    vae_params = jax.device_put(vae_params)
    cnn_vars = jax.device_put(cnn_vars)
    mean, std = jnp.asarray(mean), jnp.asarray(std)
    thrj = jnp.float32(thr)

    reps = -(-5440 // W.shape[0])
    W = np.concatenate([W] * reps)[:5440].astype(np.float32)

    kw = dict(use_fused_vae=True, fused_dtype=jnp.bfloat16)
    nhwc = make_hybrid_fn(vae, cnn, **kw)
    tr = make_hybrid_fn(vae, cnn, fused_layout="transposed", **kw)

    # ---- agreement on trained artifacts ----
    Wd = jax.device_put(jnp.asarray(W))
    a = nhwc(vae_params, cnn_vars, Wd, mean, std, thrj)
    b = tr(vae_params, cnn_vars, Wd, mean, std, thrj)
    gate_agree = float((np.asarray(a.anomalous) == np.asarray(b.anomalous)).mean())
    pred_agree = float((np.asarray(a.y_pred) == np.asarray(b.y_pred)).mean())
    logit_rel = float(np.max(np.abs(np.asarray(a.logits) - np.asarray(b.logits))
                             / (np.abs(np.asarray(a.logits)) + 1e-3)))
    print(f"agreement: gate={gate_agree:.4f} y_pred={pred_agree:.4f} "
          f"max-rel-logit-diff={logit_rel:.3e}")

    for tag, n_rep, mult in (("end-to-end 5440", 20, 1),
                             ("device-side 4x (21760)", 6, 4)):
        Wn = np.concatenate([W] * mult)
        Wdn = jax.device_put(jnp.asarray(Wn))
        N = Wn.shape[0]
        # pre-normalize OUTSIDE the timed lambda: eager array math per repeat
        # adds extra dispatches and deflated this very reading ~30% once
        # (523k measured as 367k — see CLAUDE.md / BENCHMARKS.md probe notes)
        Zdn = jax.device_put((jnp.asarray(Wn) - mean) / std)
        float(Zdn.sum())
        t_gate = timed(lambda *a_: (reconstruction_mse(
            vae, vae_params, Zdn, fused="auto"),),
            repeats=n_rep)
        t_nhwc = timed(lambda: nhwc(vae_params, cnn_vars, Wdn, mean, std, thrj),
                       repeats=n_rep)
        t_tr = timed(lambda: tr(vae_params, cnn_vars, Wdn, mean, std, thrj),
                     repeats=n_rep)
        print(f"[{tag}] gate-only {N/t_gate:,.0f} win/s | "
              f"nhwc hybrid {N/t_nhwc:,.0f} win/s | "
              f"transposed hybrid {N/t_tr:,.0f} win/s "
              f"({(t_nhwc/t_tr - 1)*100:+.1f}%)")


if __name__ == "__main__":
    main()
