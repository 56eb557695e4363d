"""Probe: where does device time go inside the fused attention kernel?

VERDICT r4 #3: the attention family scores ~2x below the recurrent kernels
and the round-3 VMEM-traffic hypothesis was refuted (streaming variant moved
throughput <±12%). This probe produces the missing measured breakdown:

1. **Analytic FLOP accounting** — matmul FLOPs per window of the attention
   gate as the MXU actually executes it (padded Tp=128 rows, Hp=128 lanes)
   vs the LSTM gate's FLOPs, giving each kernel's MFU on the same chip.
   If the attention kernel's MFU is at family parity, the win/s gap is
   architecture FLOP volume, not kernel inefficiency.
2. **Stage ablation** — the kernel's `_ablate` probe knob skips one stage's
   work at a time ({ln, proj, attn_mm, softmax, mlp}); differencing each
   variant against the full kernel attributes device time per stage.
   Ablated outputs are numerically wrong by design; only times are read.
3. **One targeted fix A/B** — `chunk_windows` (windows per batched
   projection/MLP matmul; default 4): larger chunks mean fewer, larger MXU
   ops over the same math (row-partitioning of a matmul leaves every row's
   dot products unchanged, so outputs must agree bit-for-bit).

Timing: device-resident inputs, one jitted call + host readback per repeat
(CLAUDE.md probe pitfalls). Run while no other TPU process is active:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_attention_breakdown.py
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
        float(np.asarray(first).sum())

    readback(fn(*args))                       # compile
    t0 = time.perf_counter()
    for _ in range(repeats):
        readback(fn(*args))
    return (time.perf_counter() - t0) / repeats


def attention_gate_flops(T=100, Tp=128, H=128, Hp=128, heads=4, layers=2,
                         mlp_ratio=4, padded=True):
    """Matmul FLOPs per window of the fused attention gate. ``padded=True``
    counts what the MXU executes (Tp rows, Hp lanes — the kernel's real
    work); False counts the model's math (T rows, H lanes)."""
    R = Tp if padded else T
    L = Hp if padded else H
    W = heads * (Tp if padded else T)         # packed score width
    per_layer = (2 * R * L * 3 * L            # QKV projection
                 + 2 * R * L * W              # scores  Q . K_cat^T
                 + 2 * R * W * L              # PV      P . V_cat
                 + 2 * R * L * L              # out projection
                 + 2 * R * L * mlp_ratio * L * 2)   # MLP in + out
    stack = 2 * R * L * L + layers * per_layer      # in_proj + layers
    heads_fc = 2 * (L * L) * 3                # mu, z2h, dec in_proj (per win)
    out_head = 2 * R * L * L                  # output projection
    return float(2 * stack + heads_fc + out_head)   # encoder + decoder


def lstm_gate_flops(T=100, D=12, H=128):
    """Matmul FLOPs per window of the LSTM gate (bench.py accounting,
    minus the CNN)."""
    enc = T * (2 * 4 * H * (D + H) + 2 * 4 * H * 2 * H)
    heads = 2 * (16 * H + H * 16)
    dec = 2 * 4 * H * H + T * (2 * 4 * H * H + 2 * 4 * H * 2 * H + 2 * D * H)
    return float(enc + heads + dec)


def main() -> None:
    sys.path.insert(0, ".")
    from bench import V5E_BF16_PEAK_FLOPS
    from shm_tpu.cli.stage4dof import (Paths, _load_stats, _load_vae,
                                       build_fraction_windows)
    from shm_tpu.config import Stage4DofConfig, replace
    from shm_tpu.data.windows import normalize_windows
    from shm_tpu.ops import fused_attention_gate, fused_vae_gate
    from shm_tpu.utils.io import load_json

    cfg = Stage4DofConfig()
    acfg = replace(cfg, vae=replace(cfg.vae, cell="attention"))
    paths = Paths("data/4dof_attention")
    mean, std = _load_stats(paths)
    _, aparams = _load_vae(paths, acfg)
    thr = float(load_json(paths.processed / "vae_threshold.json")["threshold"])
    splits = load_json(paths.run_splits)
    W = np.concatenate([
        build_fraction_windows(splits[g]["files"], cfg.test_frac, cfg)
        for g in ("normal", "sensor_fault", "structural_fault")
    ]).astype(np.float32)
    print(f"windows: {W.shape}, threshold {thr:.4f}", flush=True)

    Z = normalize_windows(jnp.asarray(W), jnp.asarray(mean), jnp.asarray(std))
    Z4 = jnp.concatenate([Z] * 4)             # 4x amortizes dispatch floor
    jax.block_until_ready(Z4)
    aparams = jax.device_put(aparams)
    N4 = int(Z4.shape[0])

    # ---- FLOP accounting ----
    f_pad = attention_gate_flops(padded=True)
    f_real = attention_gate_flops(padded=False)
    f_lstm = lstm_gate_flops()
    print(f"\nattention gate matmul FLOPs/window: padded (as executed) "
          f"{f_pad/1e6:.1f}M, model-math {f_real/1e6:.1f}M")
    print(f"LSTM gate matmul FLOPs/window: {f_lstm/1e6:.1f}M "
          f"(attention = {f_pad/f_lstm:.2f}x padded, "
          f"{f_real/f_lstm:.2f}x model-math)")

    # ---- full-kernel reference points (bt=16 default and bt=32) ----
    def gate_fn(bt, cw=None, ablate=()):
        return jax.jit(lambda p, Zb: fused_attention_gate(
            p, Zb, batch_tile=bt, chunk_windows=cw, _ablate=tuple(ablate),
            with_residual=False)[0])

    rows = []
    for bt in (16, 32):
        dt = timed(gate_fn(bt), aparams, Z4)
        rate = N4 / dt
        mfu = rate * f_pad / V5E_BF16_PEAK_FLOPS
        rows.append((f"full bt={bt}", dt, rate, mfu))
        print(f"full bt={bt}: {rate/1e3:.1f}k win/s  "
              f"(padded-FLOP MFU {mfu*100:.1f}%)", flush=True)
    full_dt = rows[0][1]                      # bt=16 = shipping default

    # LSTM family reference, same process/workload
    lstm_paths = Paths("data/4dof")
    _, lparams = _load_vae(lstm_paths, cfg)
    lmean, lstd = _load_stats(lstm_paths)
    Zl4 = jnp.concatenate([normalize_windows(
        jnp.asarray(W), jnp.asarray(lmean), jnp.asarray(lstd))] * 4)
    jax.block_until_ready(Zl4)
    lparams = jax.device_put(lparams)
    lstm_fn = jax.jit(lambda p, Zb: fused_vae_gate(
        p, Zb, num_layers=2, use_layernorm=True, with_residual=False)[0])
    dt_l = timed(lstm_fn, lparams, Zl4)
    print(f"LSTM kernel (same process): {N4/dt_l/1e3:.1f}k win/s "
          f"(MFU {N4/dt_l*f_lstm/V5E_BF16_PEAK_FLOPS*100:.1f}%)", flush=True)

    # ---- stage ablation (bt=16, packed path) ----
    print("\nstage ablation (bt=16; delta vs full = stage's device time):")
    stage_dts = {}
    for stage in ("ln", "proj", "attn_mm", "softmax", "mlp",
                  ("ln", "proj", "attn_mm", "softmax", "mlp")):
        abl = (stage,) if isinstance(stage, str) else stage
        name = "+".join(abl) if len(abl) > 1 else abl[0]
        dt = timed(gate_fn(16, ablate=abl), aparams, Z4)
        stage_dts[name] = dt
        delta = full_dt - dt
        print(f"  -{name:<38s} {dt*1e3:7.2f} ms  "
              f"stage cost {delta*1e3:6.2f} ms ({delta/full_dt*100:5.1f}%)",
              flush=True)
    floor = stage_dts["ln+proj+attn_mm+softmax+mlp"]
    print(f"  full kernel {full_dt*1e3:.2f} ms; all-ablated floor "
          f"(loops + IO + pool/epilogue) {floor*1e3:.2f} ms "
          f"({floor/full_dt*100:.1f}%)")

    # ---- targeted fix A/B: chunk_windows ----
    print("\nchunk_windows A/B (projection/MLP matmul height):")
    base = np.asarray(gate_fn(16)(aparams, Z4))
    for bt, cw in ((16, 8), (16, 16), (32, 16), (32, 32)):
        # per-variant guard: cw=32 at bt=32 exceeds the scoped-VMEM budget
        # (compile failure) — record it and keep probing instead of dying
        try:
            fn = gate_fn(bt, cw=cw)
            dt = timed(fn, aparams, Z4)
            mse = np.asarray(fn(aparams, Z4))
        except Exception as e:
            print(f"  bt={bt} cw={cw}: FAILED ({type(e).__name__}: "
                  f"{str(e)[-160:]})", flush=True)
            continue
        agree = float(np.mean((mse > thr) == (base > thr)))
        print(f"  bt={bt} cw={cw}: {N4/dt/1e3:6.1f}k win/s  "
              f"(vs full bt={bt}) gate agreement {agree*100:.4f}%  "
              f"max rel mse diff {np.max(np.abs(mse-base)/np.abs(base)):.2e}",
              flush=True)


if __name__ == "__main__":
    main()
