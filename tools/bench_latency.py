"""Serving latency: p50/p99 per request size through HybridScorer.

Measures end-to-end request latency (submit -> host-visible result, honest
readback) for the trained 4DOF artifacts across request sizes, using the
bucket-padded serving path (shm_tpu/serve.py). On the remote-tunneled
platform the ~25-30 ms RPC floor dominates small requests; on a local TPU
the same dispatch is sub-ms.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_latency.py
"""

from __future__ import annotations

import json
import time

import numpy as np

REPS = 30
SIZES = (1, 64, 256, 1024, 5440)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=list(SIZES))
    ap.add_argument("--reps", type=int, default=REPS)
    args = ap.parse_args()
    from shm_tpu.cli.stage4dof import Paths, build_fraction_windows
    from shm_tpu.config import Stage4DofConfig
    from shm_tpu.serve import HybridScorer
    from shm_tpu.utils.io import load_json

    root = "data/4dof"
    scorer = HybridScorer.from_artifacts(root)
    cfg = Stage4DofConfig()
    splits = load_json(Paths(root).run_splits)
    W = np.concatenate([
        build_fraction_windows(splits[g]["files"], cfg.test_frac, cfg)
        for g in ("normal", "sensor_fault", "structural_fault")
    ]).astype(np.float32)

    # warm exactly the buckets the requested sizes ride in (a full warmup
    # compiles every bucket — ~6 remote compiles, minutes on this platform)
    need = sorted({scorer._bucket(min(n, scorer.max_batch)) for n in args.sizes})
    scorer.warmup(batch_sizes=need)
    for n in args.sizes:
        reqs = [W[(i * 97) % max(len(W) - n, 1):][:n] for i in range(args.reps)]
        reqs = [r if len(r) == n else W[:n] for r in reqs]
        lats = []
        for r in reqs:
            t0 = time.perf_counter()
            scorer.score(r)              # returns numpy -> completion proven
            lats.append((time.perf_counter() - t0) * 1e3)
        lats = np.sort(lats)
        print(json.dumps({
            "request_windows": n,
            "p50_ms": round(float(np.percentile(lats, 50)), 2),
            "p99_ms": round(float(np.percentile(lats, 99)), 2),
            "windows_per_sec_p50": round(n / np.percentile(lats, 50) * 1e3),
        }), flush=True)


if __name__ == "__main__":
    main()
