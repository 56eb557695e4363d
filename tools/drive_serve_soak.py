"""Soak drive: EVERY serving feature at once, under concurrent load, real chip.

The round-3 serving features were each driven in isolation (BENCHMARKS.md:
dynamic batching, drift monitoring, hot reload, shadow scoring, live
recalibration). This soak runs them SIMULTANEOUSLY — the test that catches
lock-ordering and swap races no single-feature drive can:

  - primary: committed LSTM artifacts (data/4dof), `--concurrent` dynamic
    batching, drift monitor auto-enabled from the threshold manifest
  - shadow: the attention candidate (data/4dof_attention) re-scoring all
    served traffic asynchronously
  - N client threads stream random-sized /score chunks and /score_series
    requests of REAL test windows for the soak duration
  - an admin thread concurrently scrapes /metrics (both formats), POSTs
    /recalibrate (healthy windows at the recorded percentile),
    /drift/reset, and one mid-soak /reload (hot primary swap)

PASS = zero failed requests (every response 200 and parseable), the reload
reaches "done" under load, and the shadow comparison stays error-free.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/drive_serve_soak.py \
        [--duration 90] [--clients 6] [--shadow-root data/4dof_attention]
"""

from __future__ import annotations

import argparse
import json
import threading
import time
import urllib.request

import numpy as np


def _req(base, path, data=None, headers=None, method=None, timeout=600):
    r = urllib.request.Request(base + path, data=data,
                               headers=headers or {}, method=method)
    with urllib.request.urlopen(r, timeout=timeout) as resp:
        return resp.status, resp.read()


def main() -> None:
    from shm_tpu.cli.stage4dof import Paths, build_fraction_windows
    from shm_tpu.config import Stage4DofConfig
    from shm_tpu.serve import HybridScorer
    from shm_tpu.serve_http import make_server
    from shm_tpu.utils.io import load_json

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--duration", type=float, default=90.0)
    ap.add_argument("--clients", type=int, default=6)
    ap.add_argument("--shadow-root", default="data/4dof_attention")
    args = ap.parse_args()

    primary = HybridScorer.from_artifacts("data/4dof",
                                          min_bucket=2048, max_batch=4096)
    shadow = HybridScorer.from_artifacts(args.shadow_root,
                                         min_bucket=2048, max_batch=4096)
    srv = make_server(primary, port=0, admin=True, concurrent=True,
                      series_strides=(1,), shadow_scorer=shadow,
                      reload_fn=lambda: HybridScorer.from_artifacts(
                          "data/4dof", min_bucket=2048, max_batch=4096))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    assert srv.warm_event.wait(timeout=1800), "warmup never finished"
    assert srv.RequestHandlerClass.warm_error is None
    while not srv.shadow.snapshot()["warmed"]:
        time.sleep(0.5)
    print("primary + shadow warm", flush=True)

    cfg = Stage4DofConfig()
    splits = load_json(Paths("data/4dof").run_splits)
    groups = [np.asarray(build_fraction_windows(splits[g]["files"],
                                                cfg.test_frac, cfg),
                         np.float32)
              for g in ("normal", "sensor_fault", "structural_fault")]
    pool = np.concatenate(groups)
    healthy = groups[0]
    T, D = pool.shape[1], pool.shape[2]
    print(f"window pool {pool.shape}", flush=True)

    stop = time.time() + args.duration
    lock = threading.Lock()
    stats = {"ok": 0, "fail": 0, "windows": 0, "latencies": [],
             "errors": []}

    def record(ok, n, dt, err=None):
        with lock:
            stats["ok" if ok else "fail"] += 1
            stats["windows"] += n
            stats["latencies"].append(dt)
            if err:
                stats["errors"].append(str(err)[:200])

    def client(cid: int) -> None:
        rng = np.random.default_rng(cid)
        while time.time() < stop:
            t0 = time.perf_counter()
            try:
                if rng.random() < 0.15:
                    # series request: a real contiguous slice re-windowized
                    # on device (length T..T+64)
                    length = T + int(rng.integers(0, 65))
                    i = int(rng.integers(0, len(pool)))
                    j = int(rng.integers(0, len(pool)))
                    x = np.concatenate([pool[i], pool[j][:length - T]])
                    code, body = _req(
                        base, "/score_series", data=x.tobytes(),
                        headers={"Content-Type": "application/octet-stream",
                                 "X-Shape": f"{length},{D}",
                                 "X-Stride": "1"}, method="POST")
                    n = json.loads(body)["n"]
                else:
                    bs = int(rng.integers(32, 513))
                    idx = rng.integers(0, len(pool), size=bs)
                    W = pool[idx]
                    code, body = _req(
                        base, "/score", data=W.tobytes(),
                        headers={"Content-Type": "application/octet-stream",
                                 "X-Shape": f"{bs},{T},{D}"}, method="POST")
                    n = len(json.loads(body)["mse"])
                record(code == 200 and n > 0, n, time.perf_counter() - t0)
            except Exception as e:
                record(False, 0, time.perf_counter() - t0, err=e)

    admin_log = []
    # cumulative shadow totals: /recalibrate and /reload RESET the engine's
    # comparison counters by design (primary decisions changed), so the
    # end-of-soak snapshot alone can read 0/0 if a reset landed last — fold
    # each pre-reset snapshot into lifetime totals instead
    shadow_totals = {"windows": 0, "gate_agree": 0, "dropped_windows": 0,
                     "errors": 0}

    def fold_shadow() -> None:
        snap = srv.shadow.snapshot()
        for k in shadow_totals:
            shadow_totals[k] += int(snap.get(k, 0))

    def admin() -> None:
        reloaded = False
        while time.time() < stop:
            time.sleep(min(12.0, max(stop - time.time(), 0.1)))
            try:
                _req(base, "/metrics")
                _req(base, "/metrics",
                     headers={"Accept": "application/json"})
                fold_shadow()             # /recalibrate resets the counters
                code, body = _req(
                    base, "/recalibrate", data=healthy.tobytes(),
                    headers={"Content-Type": "application/octet-stream",
                             "X-Shape": f"{len(healthy)},{T},{D}"},
                    method="POST")
                admin_log.append(("recalibrate", code,
                                  json.loads(body).get("threshold")))
                _req(base, "/drift/reset", data=b"", method="POST")
                if not reloaded and time.time() > stop - args.duration / 2:
                    fold_shadow()         # /reload resets the counters too
                    code, _ = _req(base, "/reload", data=b"", method="POST")
                    admin_log.append(("reload", code, None))
                    for _ in range(600):
                        _, body = _req(base, "/reload")
                        state = json.loads(body)["state"]
                        if state in ("done", "error"):
                            admin_log.append(("reload_state", state, None))
                            break
                        time.sleep(0.5)
                    reloaded = True
            except Exception as e:
                admin_log.append(("admin_error", str(e)[:200], None))

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(args.clients)]
    threads.append(threading.Thread(target=admin, daemon=True))
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=args.duration + 900)
    wall = time.perf_counter() - t0

    lat = np.sort(np.asarray(stats["latencies"]))
    fold_shadow()                       # last inter-reset interval
    snap = shadow_totals
    _, body = _req(base, "/metrics", headers={"Accept": "application/json"})
    m = json.loads(body)
    print(f"soak {wall:.1f}s: {stats['ok']} ok / {stats['fail']} failed "
          f"requests, {stats['windows']} windows "
          f"({stats['windows'] / wall:,.0f} win/s)", flush=True)
    if len(lat):
        print(f"latency p50 {lat[len(lat) // 2] * 1e3:.0f} ms  "
              f"p99 {lat[int(len(lat) * 0.99)] * 1e3:.0f} ms  "
              f"max {lat[-1] * 1e3:.0f} ms", flush=True)
    print(f"admin log: {admin_log}", flush=True)
    print(f"shadow: compared {snap['windows']} dropped "
          f"{snap['dropped_windows']} errors {snap['errors']} "
          f"gate_agree {snap['gate_agree']}/{snap['windows']}", flush=True)
    print(f"drift: {m.get('drift')}", flush=True)

    failures = stats["fail"] + len([e for e in admin_log
                                    if e[0] == "admin_error"])
    assert failures == 0, f"{failures} failures: {stats['errors'][:5]}"
    assert ("reload_state", "done", None) in admin_log, "reload never finished"
    assert snap["errors"] == 0, "shadow scoring errors"
    print("SOAK PASS", flush=True)

    srv.shutdown()
    srv.server_close()
    if srv.batcher is not None:
        srv.batcher.close()
    if srv.shadow is not None:
        srv.shadow.close()


if __name__ == "__main__":
    main()
