"""Probe: openLAB VAE fused whole-run compile + run cost on the real TPU.

The openLAB `train-vae` CLI pins `fused_epochs=False` on a measured ~460 s
remote compile for the fused whole-run program (T=200, 1-layer H=64, bs=64)
vs ~72 s for the complete 100-epoch loop run. Round 1's "f32 cliff" turned
out to be an environment artifact (tools/probe_f32_cliff.py), so this probe
re-measures the fused path under controlled conditions: a fresh process, an
E=1 compile-dominated run first, then the full E=100 fused run, then the
loop path for the same recipe.

Usage: python tools/probe_openlab_fused.py [--skip-loop]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-loop", action="store_true")
    ap.add_argument("--epochs", type=int, default=100)
    args = ap.parse_args()

    from dataclasses import replace

    from shm_tpu.config import OpenLabConfig
    from shm_tpu.models.vae import vae_from_config
    from shm_tpu.train.vae import train_vae

    cfg = OpenLabConfig()
    rng = np.random.default_rng(0)
    # the real workload shape: 1,004 standardized (200, 3) normal windows
    Z = rng.normal(size=(1004, cfg.seq_len, 3)).astype(np.float32)
    Zva = Z[: len(Z) // 10]
    model = vae_from_config(cfg.vae)

    t0 = time.perf_counter()
    res1 = train_vae(model, Z, Zva, replace(cfg.vae_train, epochs=1),
                     log_every=0, fused_epochs=True)
    t_e1 = time.perf_counter() - t0
    print(f"fused E=1 (compile-dominated): {t_e1:.1f}s "
          f"(inner seconds={res1.seconds:.1f})", flush=True)

    tcfg = replace(cfg.vae_train, epochs=args.epochs)
    t0 = time.perf_counter()
    res = train_vae(model, Z, Zva, tcfg, log_every=0, fused_epochs=True)
    t_fused = time.perf_counter() - t0
    print(f"fused E={args.epochs}: {t_fused:.1f}s "
          f"(inner seconds={res.seconds:.1f}, best_val={res.best_val:.6f})",
          flush=True)

    if not args.skip_loop:
        t0 = time.perf_counter()
        res_loop = train_vae(model, Z, Zva, tcfg, log_every=0,
                             fused_epochs=False)
        t_loop = time.perf_counter() - t0
        print(f"loop E={args.epochs}: {t_loop:.1f}s "
              f"(inner seconds={res_loop.seconds:.1f}, "
              f"best_val={res_loop.best_val:.6f})", flush=True)
        tl_f = np.asarray(res.history["train_total"])
        tl_l = np.asarray(res_loop.history["train_total"])
        print(f"trajectory max |diff|: {np.abs(tl_f - tl_l).max():.2e}",
              flush=True)


if __name__ == "__main__":
    main()
