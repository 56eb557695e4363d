"""Probe: chunked-epoch fusion for the openLAB VAE recipe (VERDICT r2 item 4).

The openLAB whole-run fused program executes 100 epochs in ~9 s but costs
~155-200 s of remote compile (round 2, tools/probe_openlab_fused.py), so the
CLI pinned fused_epochs=False (~72 s one-shot loop run). The middle ground —
one K-epoch program dispatched 100/K times — should compile in seconds while
eliminating most of the loop's 16-dispatches-per-epoch overhead.

Measures, same-process, openLAB-shaped workload (N=1004 windows, T=200, D=3,
H=64, 1 layer, batch 64, 100 epochs; reference recipe Codes/04_train_vae.py):

  per-batch loop | K=5 | K=10 | K=25 | whole-run (K=100)

each as cold compile+run wall-clock (what a CLI invocation pays), plus
trajectory bit-identity checks across all variants.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_epoch_chunks.py
"""

from __future__ import annotations

import time

import numpy as np

from shm_tpu.config import OpenLabConfig
from shm_tpu.models import vae_from_config
from shm_tpu.train.vae import train_vae


def main() -> None:
    cfg = OpenLabConfig()
    model = vae_from_config(cfg.vae)
    rng = np.random.default_rng(0)
    N, T, D = 1004, cfg.seq_len, cfg.vae.input_dim
    Z = rng.normal(size=(N, T, D)).astype(np.float32)
    Zva = Z[: max(N // 10, 1)]
    tcfg = cfg.vae_train

    results = {}
    ref_hist = None
    for tag, kw in (
        ("loop", dict(fused_epochs=False)),
        ("K=5", dict(fused_epochs=True, epoch_chunk=5)),
        ("K=10", dict(fused_epochs=True, epoch_chunk=10)),
        ("K=25", dict(fused_epochs=True, epoch_chunk=25)),
        ("whole-run", dict(fused_epochs=True)),
    ):
        t0 = time.perf_counter()
        res = train_vae(model, Z, Zva, tcfg, **kw)
        wall = time.perf_counter() - t0
        results[tag] = wall
        print(f"{tag:>10}: {wall:6.1f}s wall (train_vae reported "
              f"{res.seconds:.1f}s) best_val={res.best_val:.6f} "
              f"@ {res.best_epoch}")
        if ref_hist is None:
            ref_hist = res.history
        else:
            same = np.array_equal(np.asarray(ref_hist["train_total"]),
                                  np.asarray(res.history["train_total"]))
            print(f"{'':>10}  trajectory bit-identical to loop: {same}")


if __name__ == "__main__":
    main()
