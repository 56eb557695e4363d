"""Probe: streaming (flash-style) vs packed softmax in the attention kernel.

VERDICT r3 #4: the head-packed kernel materializes a [Tp, heads*Tp] score
tensor per window (f32) plus [heads*Tp, Hp] K/V concatenations — diagnosed
as the VMEM-traffic reason the attention kernel sits ~2x below the
recurrent kernels. ops/fused_attention.py now carries a ``stream=True``
inner loop (per-head [Tp, 128] key blocks, online max/denominator, no
concatenations). This probe A/Bs the two, same-process:

  1. 4DOF trained artifacts (data/4dof_attention; T=100 -> Tp=128, one key
     block per head — the degenerate-online regime, wins can only come
     from dropping the concatenated materializations), batch tiles 8/16/32.
  2. openLAB attention shape (H=64, 1 layer, T=200 -> Tp=256, TWO key
     blocks per head — the genuinely-online regime with the 1 MB score
     block). Uses the trained data/openlab_attention artifacts when
     present, random params otherwise.
  3. Decision agreement packed-vs-stream at the deployed threshold.

Timing: device-resident inputs, one jitted call + host readback per repeat.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_attention_stream.py
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


def timed(fn, *args, repeats=20):
    def readback(out):
        float(np.asarray(out).sum())

    readback(fn(*args))
    t0 = time.perf_counter()
    for _ in range(repeats):
        readback(fn(*args))
    return (time.perf_counter() - t0) / repeats


def main() -> None:
    from pathlib import Path

    from shm_tpu.cli.stage4dof import Paths, _load_stats, _load_vae
    from shm_tpu.config import Stage4DofConfig
    from shm_tpu.models import TemporalVAE
    from shm_tpu.ops import fused_attention_gate
    from shm_tpu.utils.io import load_json

    results = {}

    # ---- 1+3: 4DOF trained artifacts --------------------------------------
    root = Path("data/4dof_attention")
    paths = Paths(str(root))
    cfg = Stage4DofConfig()
    mean, std = _load_stats(paths)
    vae_a, vae_a_params = _load_vae(paths, cfg)
    assert vae_a.cell == "attention", vae_a.cell
    thr = float(load_json(paths.processed / "vae_threshold.json")["threshold"])
    vae_a_params = jax.device_put(vae_a_params)

    from bench import load_trained_workload

    _, _, _, _, W, _, _, _ = load_trained_workload()
    reps = -(-5440 // W.shape[0])
    W = np.concatenate([W] * reps)[:5440].astype(np.float32)
    Z = jax.device_put((jnp.asarray(W) - jnp.asarray(mean)) / jnp.asarray(std))
    float(np.asarray(Z).sum())
    N = Z.shape[0]
    print(f"4DOF: {N} real test windows, trained artifacts, thr={thr:.4f}",
          flush=True)

    def gate(streaming, bt):
        return jax.jit(lambda p, Zb: fused_attention_gate(
            p, Zb, num_layers=2, use_layernorm=True, with_residual=False,
            batch_tile=bt, io_dtype=jnp.bfloat16, stream=streaming)[0])

    mse_p = np.asarray(gate(False, 16)(vae_a_params, Z))
    mse_s = np.asarray(gate(True, 16)(vae_a_params, Z))
    rel = np.abs(mse_s - mse_p) / np.maximum(np.abs(mse_p), 1e-8)
    agree = float(np.mean((mse_s > thr) == (mse_p > thr)))
    print(f"stream-vs-packed mse rel: max {rel.max():.3e}; "
          f"decision agreement {agree:.4%}", flush=True)
    results["4dof_agreement"] = agree
    results["4dof_rel_max"] = float(rel.max())

    print("\n-- 4DOF gate-only win/s (T=100, 1 key block/head) --", flush=True)
    for bt in (8, 16, 32):
        row = {}
        for name, streaming in (("packed", False), ("stream", True)):
            dt = timed(gate(streaming, bt), vae_a_params, Z)
            row[name] = N / dt
            print(f"bt={bt:<3d} {name:7s} {N/dt:10.0f}", flush=True)
        results[f"4dof_bt{bt}"] = row

    # ---- 2: openLAB shape (T=200 -> 2 key blocks per head) ----------------
    ol_root = Path("data/openlab_attention/output/VAE_Training/artifacts")
    model = TemporalVAE(input_dim=3, latent_dim=8, hidden_dim=64,
                        num_layers=1, dropout=0.2, use_layernorm=True,
                        cell="attention")
    Nol, T, D = 6432, 200, 3
    rng = np.random.default_rng(0)
    Zol = jax.device_put(jnp.asarray(
        rng.normal(size=(Nol, T, D)).astype(np.float32)))
    if (ol_root / "vae_exceedance_clean.msgpack").exists():
        from shm_tpu.utils.checkpoint import load_params

        template = model.init({"params": jax.random.PRNGKey(0)},
                              jnp.zeros((2, T, D)))
        ol_params = load_params(
            {"params": template["params"]},
            ol_root / "vae_exceedance_clean.msgpack")["params"]
        src = "TRAINED data/openlab_attention artifacts"
    else:
        ol_params = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((2, T, D)))["params"]
        src = "random params (trained artifacts absent)"
    ol_params = jax.device_put(ol_params)
    float(np.asarray(Zol).sum())
    print(f"\nopenLAB shape: {Nol} windows of ({T},{D}), {src}", flush=True)

    def ol_gate(streaming, bt):
        return jax.jit(lambda p, Zb: fused_attention_gate(
            p, Zb, num_layers=1, use_layernorm=True, with_residual=False,
            batch_tile=bt, io_dtype=jnp.bfloat16, stream=streaming)[0])

    m_p = np.asarray(ol_gate(False, 8)(ol_params, Zol))
    m_s = np.asarray(ol_gate(True, 8)(ol_params, Zol))
    rel = np.abs(m_s - m_p) / np.maximum(np.abs(m_p), 1e-8)
    print(f"stream-vs-packed mse rel: max {rel.max():.3e}", flush=True)
    results["openlab_rel_max"] = float(rel.max())

    print("\n-- openLAB gate-only win/s (T=200, 2 key blocks/head) --",
          flush=True)
    for bt in (8, 16):
        row = {}
        for name, streaming in (("packed", False), ("stream", True)):
            dt = timed(ol_gate(streaming, bt), ol_params, Zol)
            row[name] = Nol / dt
            print(f"bt={bt:<3d} {name:7s} {Nol/dt:10.0f}", flush=True)
        results[f"openlab_bt{bt}"] = row

    print("\n" + json.dumps({k: (round(v, 4) if isinstance(v, float) else
                                 {kk: round(vv) for kk, vv in v.items()})
                             for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
