"""Drive: shadow (canary) scoring + live recalibration on the real chip.

The round-3 story this validates end-to-end: the minGRU preset is a
throughput lever that must be validated per deployment (BENCHMARKS.md).
Here the daemon serves the committed LSTM artifacts (data/4dof) while the
committed minGRU artifacts (data/4dof_mingru) shadow-score the same live
traffic; the agreement stats on /metrics are exactly the evidence an
operator promotes on. Then POST /recalibrate re-thresholds the gate from
the healthy test windows and /reload restores the on-disk calibration.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/drive_serve_shadow.py
"""

from __future__ import annotations

import json
import threading
import time
import urllib.request

import numpy as np


def _req(base, path, data=None, headers=None, method=None):
    r = urllib.request.Request(base + path, data=data,
                               headers=headers or {}, method=method)
    with urllib.request.urlopen(r, timeout=600) as resp:
        return resp.status, resp.read()


def main() -> None:
    import argparse

    from shm_tpu.cli.stage4dof import Paths, build_fraction_windows
    from shm_tpu.config import Stage4DofConfig
    from shm_tpu.serve import HybridScorer
    from shm_tpu.serve_http import make_server
    from shm_tpu.utils.io import load_json

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--shadow-root", default="data/4dof_mingru",
                    help="artifact root of the CANDIDATE scorer "
                         "(e.g. data/4dof_attention)")
    args = ap.parse_args()

    primary = HybridScorer.from_artifacts("data/4dof",
                                          min_bucket=2048, max_batch=4096)
    shadow = HybridScorer.from_artifacts(args.shadow_root,
                                         min_bucket=2048, max_batch=4096)
    print(f"primary thr={float(np.asarray(primary.threshold)):.4f} "
          f"(cell=lstm)  shadow thr={float(np.asarray(shadow.threshold)):.4f} "
          f"(cell={getattr(shadow.vae_model, 'cell', 'lstm')})", flush=True)

    srv = make_server(primary, port=0, admin=True, series_strides=(),
                      shadow_scorer=shadow,
                      shadow_max_pending_windows=8192,
                      reload_fn=lambda: HybridScorer.from_artifacts(
                          "data/4dof", min_bucket=2048, max_batch=4096))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    t0 = time.perf_counter()
    assert srv.warm_event.wait(timeout=1200), "warmup never finished"
    assert srv.RequestHandlerClass.warm_error is None
    print(f"primary warm in {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    while not srv.shadow.snapshot()["warmed"]:
        time.sleep(0.5)
    print(f"shadow warm {time.perf_counter() - t0:.1f}s after ready",
          flush=True)

    cfg = Stage4DofConfig()
    splits = load_json(Paths("data/4dof").run_splits)
    groups = {g: build_fraction_windows(splits[g]["files"], cfg.test_frac, cfg)
              for g in ("normal", "sensor_fault", "structural_fault")}
    sizes = {g: len(w) for g, w in groups.items()}
    print(f"test windows: {sizes}", flush=True)

    # ---- live traffic, shadow comparing ------------------------------
    t0 = time.perf_counter()
    for g, W in groups.items():
        W = np.asarray(W, np.float32)
        code, body = _req(base, "/score", data=W.tobytes(),
                          headers={"Content-Type": "application/octet-stream",
                                   "X-Shape": f"{len(W)},{W.shape[1]},"
                                              f"{W.shape[2]}"},
                          method="POST")
        assert code == 200
        got = json.loads(body)
        print(f"  {g}: {len(W)} windows, primary gate rate "
              f"{np.mean(got['anomalous']):.4f}", flush=True)
    serve_dt = time.perf_counter() - t0
    total = sum(sizes.values())
    # wait on COMPARED+DROPPED reaching the served total, not queue drain:
    # the server enqueues to the shadow AFTER sending the response, so
    # pending_windows can read 0 before the last request's windows are even
    # submitted (same race tests/test_serve_shadow.py pins for /reload)
    deadline = time.time() + 600
    while time.time() < deadline:
        snap = srv.shadow.snapshot()
        if snap["windows"] + snap["dropped_windows"] >= total:
            break
        time.sleep(0.5)
    snap = srv.shadow.snapshot()
    print(f"served {total} windows in {serve_dt:.2f}s "
          f"({total / serve_dt:,.0f} win/s through HTTP)", flush=True)
    print("shadow comparison:", flush=True)
    print(f"  windows compared {snap['windows']} "
          f"(dropped {snap['dropped_windows']}, errors {snap['errors']})",
          flush=True)
    print(f"  gate agreement  {snap['gate_agreement']:.6f}", flush=True)
    print(f"  pred agreement  {snap['pred_agreement']:.6f}", flush=True)
    print(f"  shadow anomaly count {snap['shadow_anomalous']} "
          f"(primary would be from /metrics)", flush=True)
    print(f"  |mse diff| mean {snap['mse_absdiff_mean']:.4g} "
          f"max {snap['mse_absdiff_max']:.4g}", flush=True)
    code, body = _req(base, "/metrics",
                      headers={"Accept": "application/json"})
    m = json.loads(body)
    print(f"  primary anomalous {m['windows_anomalous']}/{m['windows_scored']}",
          flush=True)

    # ---- live recalibration on the healthy test windows --------------
    Wn = np.asarray(groups["normal"], np.float32)
    code, body = _req(base, "/recalibrate", data=Wn.tobytes(),
                      headers={"Content-Type": "application/octet-stream",
                               "X-Shape": f"{len(Wn)},{Wn.shape[1]},"
                                          f"{Wn.shape[2]}"},
                      method="POST")
    assert code == 200, body
    r = json.loads(body)
    print(f"recalibrate (p{r['percentile']:g} of {r['n_windows']} healthy "
          f"TEST windows): threshold {r['old_threshold']:.4f} -> "
          f"{r['threshold']:.4f} (VAL-calibrated artifact: "
          f"{r['old_threshold']:.4f}); healthy-score p99 "
          f"{r['score_summary']['p99']:.4f}", flush=True)

    # ---- /reload restores the on-disk calibration ---------------------
    code, _ = _req(base, "/reload", data=b"", method="POST")
    assert code == 202
    for _ in range(1200):
        _, body = _req(base, "/reload")
        if json.loads(body)["state"] == "done":
            break
        time.sleep(0.5)
    _, body = _req(base, "/info")
    info = json.loads(body)
    print(f"post-reload threshold {info['threshold']:.4f} (artifact "
          f"restored); shadow comparison reset to "
          f"{info['shadow']['windows']} windows", flush=True)

    srv.shutdown()
    srv.server_close()
    srv.shadow.close()


if __name__ == "__main__":
    main()
