"""Probe: concurrent-client HTTP serving — single-threaded accept vs
thread-per-connection + DynamicBatcher coalescing.

Same-process A/B (the only trustworthy comparison on this platform —
CLAUDE.md): ONE warmed HybridScorer is served by both server modes in
sequence inside this process, so both modes dispatch the exact same
compiled bucket programs. k client threads each POST m requests of
``--req-windows`` real 4DOF test windows to /score and we record wall
time, aggregate request throughput, and per-request latency percentiles.

What the batcher buys: k concurrent small requests served serially cost k
remote-dispatch floors (~20-30 ms each here); coalesced they share one or
two bucket dispatches.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_concurrent_http.py
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
import urllib.request

import numpy as np


def _post(base: str, W: np.ndarray) -> dict:
    n, T, D = W.shape
    r = urllib.request.Request(
        base + "/score", data=W.tobytes(),
        headers={"Content-Type": "application/octet-stream",
                 "X-Shape": f"{n},{T},{D}"}, method="POST")
    with urllib.request.urlopen(r, timeout=600) as resp:
        return json.loads(resp.read())


def drive(base: str, W: np.ndarray, clients: int, reqs_per_client: int):
    lat: list = []
    lock = threading.Lock()
    errs: list = []

    def client(i: int):
        for j in range(reqs_per_client):
            t0 = time.perf_counter()
            try:
                out = _post(base, W)
                dt = time.perf_counter() - t0
                assert len(out["mse"]) == W.shape[0]
                with lock:
                    lat.append(dt)
            except Exception as e:            # noqa: BLE001 - record + report
                with lock:
                    errs.append(f"client {i} req {j}: {e}")

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errs:
        raise RuntimeError("; ".join(errs[:3]))
    lat_ms = sorted(1e3 * x for x in lat)
    n = len(lat_ms)
    return {
        "wall_s": round(wall, 3),
        "req_per_s": round(n / wall, 2),
        "windows_per_s": round(n * W.shape[0] / wall, 1),
        "p50_ms": round(lat_ms[n // 2], 1),
        "p90_ms": round(lat_ms[int(n * 0.9)], 1),
        "max_ms": round(lat_ms[-1], 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--reqs-per-client", type=int, default=5)
    ap.add_argument("--req-windows", type=int, default=256)
    ap.add_argument("--batch-window-ms", type=float, default=5.0)
    ap.add_argument("--min-bucket", type=int, default=256)
    ap.add_argument("--max-batch", type=int, default=4096)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from bench import load_trained_workload
    from shm_tpu.serve import HybridScorer
    from shm_tpu.serve_http import make_server

    wl = load_trained_workload()
    if wl is None:
        raise SystemExit("trained data/4dof artifacts required")
    W_all = wl[4]
    W = W_all[:: max(len(W_all) // args.req_windows, 1)][:args.req_windows]
    W = np.ascontiguousarray(W, np.float32)

    scorer = HybridScorer.from_artifacts(
        "data/4dof", min_bucket=args.min_bucket, max_batch=args.max_batch)
    t0 = time.perf_counter()
    scorer.warmup()
    print(f"[warm] buckets {list(scorer.buckets())} in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    results = {}
    for mode, kw in (("single", {}),
                     ("batched", {"concurrent": True,
                                  "batch_window_ms": args.batch_window_ms})):
        srv = make_server(scorer, port=0, warmup=False, **kw)
        th = threading.Thread(target=srv.serve_forever, daemon=True)
        th.start()
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        drive(base, W, 2, 2)                       # warm the socket path
        results[mode] = drive(base, W, args.clients, args.reqs_per_client)
        srv.shutdown()
        if srv.batcher is not None:
            srv.batcher.close()
        print(f"[{mode}] {results[mode]}", flush=True)

    speedup = (results["batched"]["windows_per_s"]
               / results["single"]["windows_per_s"])
    print(json.dumps({
        "clients": args.clients, "req_windows": args.req_windows,
        "reqs_per_client": args.reqs_per_client,
        "batch_window_ms": args.batch_window_ms,
        "single": results["single"], "batched": results["batched"],
        "batched_over_single_throughput": round(speedup, 3),
    }))


if __name__ == "__main__":
    main()
