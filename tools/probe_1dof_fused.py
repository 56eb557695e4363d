"""Probe: stage1dof VAE fused-vs-loop training cost on the real TPU.

The fused_epochs TPU default was measured on the 4DOF (win) and openLAB
(loss -> pinned off) workloads but never on the 1-DOF shape (T=80, 2-layer
H=32, ~1.4k windows, 100 epochs). Measures fused E=1 (compile), fused E=100,
and loop E=100. Also runs a short 4DOF-preset Pallas-kernel training as a
TPU smoke check of the custom-VJP kernels.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_1dof_fused.py
"""

from __future__ import annotations

import time
from dataclasses import replace

import numpy as np


def main() -> None:
    from shm_tpu.config import Stage1DofConfig, Stage4DofConfig
    from shm_tpu.models.vae import vae_from_config
    from shm_tpu.train.vae import train_vae

    cfg = Stage1DofConfig()
    rng = np.random.default_rng(0)
    W = rng.normal(size=(1421, cfg.seq_len, 12)).astype(np.float32)
    Wva = W[: len(W) // 10]
    model = vae_from_config(cfg.vae)

    t0 = time.perf_counter()
    train_vae(model, W, Wva, replace(cfg.train, epochs=1),
              log_every=0, fused_epochs=True)
    print(f"1dof fused E=1 (compile): {time.perf_counter() - t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    res_f = train_vae(model, W, Wva, cfg.train, log_every=0, fused_epochs=True)
    print(f"1dof fused E={cfg.train.epochs}: {time.perf_counter() - t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    res_l = train_vae(model, W, Wva, cfg.train, log_every=0,
                      fused_epochs=False)
    print(f"1dof loop  E={cfg.train.epochs}: {time.perf_counter() - t0:.1f}s",
          flush=True)
    diff = np.abs(np.asarray(res_f.history["train_total"])
                  - np.asarray(res_l.history["train_total"])).max()
    print(f"1dof trajectory max |diff|: {diff:.2e}", flush=True)

    # 4DOF Pallas training-kernel smoke (post dec-kernel carry cleanup)
    cfg4 = Stage4DofConfig()
    W4 = rng.normal(size=(512, cfg4.seq_len, cfg4.num_features)).astype(np.float32)
    model4 = vae_from_config(cfg4.vae)
    t0 = time.perf_counter()
    res_k = train_vae(model4, W4, W4[:128], replace(cfg4.vae_train, epochs=3),
                      log_every=0, fused_epochs=True, use_pallas_kernel=True)
    tl = np.asarray(res_k.history["train_total"])
    assert np.isfinite(tl).all(), f"non-finite kernel-path losses: {tl}"
    print(f"4dof kernel-path E=3: {time.perf_counter() - t0:.1f}s "
          f"losses={np.round(tl, 4).tolist()}", flush=True)


if __name__ == "__main__":
    main()
