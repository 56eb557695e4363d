"""Drive: HybridScorer serving on an opt-in preset's artifacts, real chip.

Verifies a non-default cell end-to-end through the SERVING surface (artifact
auto-detection -> fused kernel where one exists, XLA path otherwise ->
bucket batching), on real windows from the shared 4DOF raw tree, and times
warmed request latency.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/drive_serve_preset.py \
        [--root data/4dof_mingru | data/4dof_attention]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    from shm_tpu.cli.stage4dof import Paths, build_fraction_windows
    from shm_tpu.config import Stage4DofConfig
    from shm_tpu.serve import HybridScorer
    from shm_tpu.utils.io import load_json

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="data/4dof_mingru",
                    help="artifact root of the preset to serve")
    args = ap.parse_args()

    scorer = HybridScorer.from_artifacts(args.root,
                                         min_bucket=2048, max_batch=4096)
    print(f"fused={scorer.use_fused_vae} seq_len={scorer.seq_len} "
          f"threshold={float(scorer.threshold):.4f}", flush=True)

    t0 = time.perf_counter()
    scorer.warmup(batch_sizes=[2048, 4096])
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)

    cfg = Stage4DofConfig()
    splits = load_json(Paths("data/4dof").run_splits)
    groups = {g: build_fraction_windows(splits[g]["files"], cfg.test_frac, cfg)
              for g in ("normal", "sensor_fault", "structural_fault")}
    W = np.concatenate(list(groups.values()))
    sizes = {g: len(w) for g, w in groups.items()}
    print(f"windows: {sizes} total {len(W)}", flush=True)

    out = scorer.score(W)                      # warmed-path request
    t0 = time.perf_counter()
    out = scorer.score(W)
    dt = time.perf_counter() - t0
    n0 = sizes["normal"]
    n1 = n0 + sizes["sensor_fault"]
    anom = out["anomalous"].astype(bool)
    print(f"gate rates: normal {anom[:n0].mean():.4f} "
          f"sensor {anom[n0:n1].mean():.4f} struct {anom[n1:].mean():.4f}",
          flush=True)
    acc = np.mean(out["y_pred"] == np.r_[np.zeros(n0), np.ones(sizes['sensor_fault']),
                                         2 * np.ones(sizes['structural_fault'])])
    print(f"3-class serving accuracy {acc:.4f} | "
          f"{len(W)} windows in {dt * 1e3:.1f} ms = {len(W) / dt:,.0f} win/s",
          flush=True)


if __name__ == "__main__":
    main()
