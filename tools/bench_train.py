"""Training-path microbenchmark: 4DOF VAE recipe shapes on the real chip.

Measures seconds/epoch for the three training execution paths (BENCHMARKS.md
"Training" table): the default per-batch XLA path, the Pallas custom-VJP
kernel path, and the fused-epochs whole-run program. Synthetic data at the
exact 4DOF recipe shapes (3,010 train / 2,010 val windows of (100, 12),
batch 256, hidden 128, 2 layers).

Usage: python tools/bench_train.py [xla|pallas|fused|all] [--epochs N]
Prints one JSON line per mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_data(seed=0, n_tr=3010, n_va=2010, T=100, D=12):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(n_tr, T, D)).astype(np.float32),
            rng.normal(size=(n_va, T, D)).astype(np.float32))


from bench import V5E_BF16_PEAK_FLOPS, cnn_flops_per_window, \
    hybrid_flops_per_window  # noqa: E402  (single source for peak + FLOPs)


def vae_fwd_flops_per_window(T=100, D=12, H=128, Z=16) -> float:
    """Analytic matmul FLOPs of one TRAINING forward per window (sampled
    path: mu AND logvar heads; elementwise/loss excluded): bench.py's
    hybrid accounting minus its CNN half, plus the logvar head (inference
    decodes z = mu and never evaluates fc_logvar)."""
    logvar_head = 2 * Z * H
    return (hybrid_flops_per_window(T, D, H, Z)
            - cnn_flops_per_window(T, D) + logvar_head)


def train_epoch_flops(n_tr=3010, n_va=2010, batch=256,
                      T=100, D=12, H=128, Z=16) -> float:
    """Analytic matmul FLOPs of ONE epoch of the 4DOF recipe: fwd+bwd on
    every (padded) train window + a sampled forward on every (padded) val
    window. Backward of a matmul chain costs 2x its forward (one matmul for
    the input grad + one for the weight grad per forward matmul), so the
    train step is 3x forward. Padded counts: the compute really runs on
    batch-padded stacks (_batch_plan pads the last batch)."""
    pad = lambda n: -(-n // batch) * batch
    return 3.0 * vae_fwd_flops_per_window(T, D, H, Z) * pad(n_tr) \
        + vae_fwd_flops_per_window(T, D, H, Z) * pad(n_va)


MODE_KWARGS = {
    "xla": {},
    "pallas": {"use_pallas_kernel": True},
    "fused": {"fused_epochs": True},
    "fused_pallas": {"fused_epochs": True, "use_pallas_kernel": True},
}


def run_mode(mode: str, epochs: int, warm_epochs: int | None = None) -> dict:
    # warm with the SAME epoch count: the fused whole-run program is
    # compiled PER epoch count, so a shorter warmup would leave the timed
    # run paying a fresh multi-epoch-scan compile (measured: 15.4 s vs
    # 2.7 s for fused epochs=10 with mismatched vs matched warmup)
    if warm_epochs is None:
        warm_epochs = epochs
    import jax
    import jax.numpy as jnp

    from shm_tpu.config import Stage4DofConfig, TrainConfig
    from shm_tpu.models import vae_from_config
    from shm_tpu.train.vae import train_vae

    cfg4 = Stage4DofConfig()
    model = vae_from_config(cfg4.vae)
    Ztr, Zva = make_data()
    kw = MODE_KWARGS[mode]

    # warmup run: pays all compiles
    tc = TrainConfig(batch_size=256, lr=1e-3, weight_decay=1e-5, grad_clip=2.0,
                     epochs=warm_epochs, seed=42)
    t0 = time.perf_counter()
    train_vae(model, Ztr, Zva, tc, **kw)
    warm_s = time.perf_counter() - t0

    tc = TrainConfig(batch_size=256, lr=1e-3, weight_decay=1e-5, grad_clip=2.0,
                     epochs=epochs, seed=42)
    t0 = time.perf_counter()
    res = train_vae(model, Ztr, Zva, tc, **kw)
    total = time.perf_counter() - t0
    sec_per_epoch = total / epochs
    # train-side MFU (VERDICT r3 #8): analytic fwd+bwd matmul FLOPs of one
    # epoch over the measured wall clock, vs the v5e bf16 peak
    epoch_flops = train_epoch_flops()
    out = {
        "mode": mode,
        "epochs": epochs,
        "sec_per_epoch": round(sec_per_epoch, 4),
        "total_sec": round(total, 3),
        "warmup_sec": round(warm_s, 3),
        "final_val": round(float(res.history["val_total"][-1]), 5),
        "epoch_train_flops": epoch_flops,
        "train_mfu": round(epoch_flops / sec_per_epoch
                           / V5E_BF16_PEAK_FLOPS, 5),
    }
    print(json.dumps(out), flush=True)
    return out


def run_marginal(mode: str, e_lo: int = 10, e_hi: int = 50) -> dict:
    """Marginal per-epoch rate of the fused whole-run program.

    train_vae's program cache (round 4) reuses compiled programs across
    calls with the same configuration, but each distinct EPOCH COUNT is a
    distinct scan length and pays its own first compile — so the honest
    marginal epoch cost differencing must use the SECOND call at each
    count: marg = (t2(e_hi) - t2(e_lo)) / (e_hi - e_lo), with both walls
    compile-free. This is the number that answers 'what does one more
    epoch cost on device'."""
    from shm_tpu.config import Stage4DofConfig, TrainConfig
    from shm_tpu.models import vae_from_config
    from shm_tpu.train.vae import train_vae

    model = vae_from_config(Stage4DofConfig().vae)
    Ztr, Zva = make_data()
    kw = MODE_KWARGS[mode]

    def wall(epochs):
        tc = TrainConfig(batch_size=256, lr=1e-3, weight_decay=1e-5,
                         grad_clip=2.0, epochs=epochs, seed=42)
        t0 = time.perf_counter()
        train_vae(model, Ztr, Zva, tc, **kw)
        return time.perf_counter() - t0

    wall(e_lo), wall(e_hi)          # absorb both scan lengths' compiles
    t_lo, t_hi = wall(e_lo), wall(e_hi)
    marg = (t_hi - t_lo) / (e_hi - e_lo)
    epoch_flops = train_epoch_flops()
    out = {
        "mode": f"{mode}-marginal",
        "epochs": [e_lo, e_hi],
        "wall": [round(t_lo, 3), round(t_hi, 3)],
        "marginal_sec_per_epoch": round(marg, 4),
        "epoch_train_flops": epoch_flops,
        "marginal_train_mfu": round(epoch_flops / marg
                                    / V5E_BF16_PEAK_FLOPS, 5),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("modes", nargs="*", default=["xla"],
                    help="xla | pallas | fused | fused_pallas | all")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--marginal", action="store_true",
                    help="difference two epoch counts to cancel the "
                         "per-call retrace/compile of the fused program")
    args = ap.parse_args()
    modes = args.modes or ["xla"]
    if modes == ["all"]:
        modes = ["xla", "pallas", "fused", "fused_pallas"]
    for m in modes:
        if args.marginal:
            run_marginal(m)
        else:
            run_mode(m, args.epochs)


if __name__ == "__main__":
    main()
