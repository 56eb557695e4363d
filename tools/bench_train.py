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


def run_mode(mode: str, epochs: int, warm_epochs: int = 2) -> dict:
    import jax
    import jax.numpy as jnp

    from shm_tpu.config import Stage4DofConfig, TrainConfig
    from shm_tpu.models import vae_from_config
    from shm_tpu.train.vae import train_vae

    cfg4 = Stage4DofConfig()
    model = vae_from_config(cfg4.vae)
    Ztr, Zva = make_data()
    kw = {}
    if mode == "pallas":
        kw = dict(use_pallas_kernel=True)
    elif mode == "fused":
        kw = dict(fused_epochs=True)
    elif mode == "fused_pallas":
        kw = dict(fused_epochs=True, use_pallas_kernel=True)

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
    out = {
        "mode": mode,
        "epochs": epochs,
        "sec_per_epoch": round(total / epochs, 4),
        "total_sec": round(total, 3),
        "warmup_sec": round(warm_s, 3),
        "final_val": round(float(res.history["val_total"][-1]), 5),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("modes", nargs="*", default=["xla"],
                    help="xla | pallas | fused | all")
    ap.add_argument("--epochs", type=int, default=10)
    args = ap.parse_args()
    modes = args.modes or ["xla"]
    if modes == ["all"]:
        modes = ["xla", "pallas", "fused"]
    for m in modes:
        run_mode(m, args.epochs)


if __name__ == "__main__":
    main()
