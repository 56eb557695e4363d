"""Probe: does JAX's persistent compilation cache work on this platform?

Runs the openLAB fused whole-run VAE program (the heaviest remote compile in
the repo: ~155 s measured) in the current process with
``jax_compilation_cache_dir`` set. Run it twice in two fresh processes: if the
second run's E=1 "compile" drops from ~150 s to seconds, the cache persists
across processes and CLIs can enable it by default.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_compile_cache.py
"""

from __future__ import annotations

import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from dataclasses import replace

    from shm_tpu.config import OpenLabConfig
    from shm_tpu.models.vae import vae_from_config
    from shm_tpu.train.vae import train_vae

    cfg = OpenLabConfig()
    rng = np.random.default_rng(0)
    Z = rng.normal(size=(1004, cfg.seq_len, 3)).astype(np.float32)
    Zva = Z[: len(Z) // 10]
    model = vae_from_config(cfg.vae)

    t0 = time.perf_counter()
    train_vae(model, Z, Zva, replace(cfg.vae_train, epochs=1),
              log_every=0, fused_epochs=True)
    print(f"fused E=1 total: {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
