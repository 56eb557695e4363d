"""Benchmark: 4DOF hybrid VAE+CNN inference throughput (windows/sec/chip).

Workload mirrors the reference's north-star path (BASELINE.md): the full 4DOF
hybrid test set — 5,440 windows of (100, 12) — through gate (LSTM-VAE recon MSE
vs threshold) + attribution (CNN on [Z, residual]). Runs the TRAINED committed
artifacts (data/4dof/models/*.msgpack, normal_stats.npz, vae_threshold.json) on
the REAL test windows (test fraction (0.7, 1.0) of every committed run, as in
4DOF/Scripts/06_test_full_pipeline.py:39); falls back to random-init params on
synthetic windows when artifacts are absent. The baseline denominator is the
reference's own algorithm (torch CPU, double VAE forward + CNN on anomalies,
faithful to 4DOF/Scripts/06_test_full_pipeline.py:327-383). ``vs_baseline``
divides by the PINNED canonical rate in BASELINE.json (idle-machine
measurement; reproducible run-to-run); the live-measured torch rate is
reported separately as ``vs_baseline_live``/``torch_cpu_windows_per_sec_live``
since it swings with machine load (BENCHMARKS.md documents two contaminated
readings).

The TPU here is remote-tunneled and can be DOWN outright for hours
(BENCHMARKS.md, .claude/skills/verify/SKILL.md): before dispatching, main()
health-probes the backend with a bounded tiny readback; on failure it re-runs
itself in an XLA-CPU subprocess so the contract (one JSON line) still holds —
the line then carries "degraded": "tpu_tunnel_down_cpu_fallback" and a CPU
rate, which is NOT a TPU measurement.

Prints ONE JSON line. Required keys: {"metric", "value", "unit",
"vs_baseline"}. "value" is the MEDIAN of PASSES independent measurement
passes in this process, with "value_min"/"value_max" as the run-to-run
spread (tunnel variance made visible in the artifact — VERDICT r4 #1), and
"full_run_p50_latency_ms" is the p50 wall latency of one full 5,440-window
run (the second half of BASELINE.json's north-star metric). Extra keys
carry FLOP accounting: "flops_per_window", "mfu" (end-to-end, vs v5e bf16
peak), "device_side_windows_per_sec"/"device_mfu" (4x workload,
remote-dispatch floor amortized — ROADMAP item 3), and
"mingru_device_side_windows_per_sec" (the opt-in non-parity minGRU preset's
fused kernel on the same workload; None when its artifacts are absent).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


N_WINDOWS = 5440
SEQ_LEN = 100
NUM_FEATURES = 12
PASSES = 3       # independent measurement passes; headline = median pass
REPEATS = 7      # timed full-run calls per pass
V5E_BF16_PEAK_FLOPS = 197e12   # per-chip bf16 peak, TPU v5e


def cnn_flops_per_window(T=SEQ_LEN, D=NUM_FEATURES) -> float:
    """Analytic matmul/conv FLOPs of one CNN4DOF attribution pass per window:
    conv3x3(2->16) @ (T,D); pool; conv3x3(16->32) @ (T/2,D/2); pool;
    fc (32*T/4*D/4 -> 128) + fc (128 -> 2)."""
    conv1 = 2 * T * D * 16 * 3 * 3 * 2
    conv2 = 2 * (T // 2) * (D // 2) * 32 * 3 * 3 * 16
    fc = 2 * (32 * (T // 4) * (D // 4)) * 128 + 2 * 128 * 2
    return float(conv1 + conv2 + fc)


def hybrid_flops_per_window(T=SEQ_LEN, D=NUM_FEATURES, H=128, Z=16) -> float:
    """Analytic FLOPs of one fused hybrid pass per window (deterministic VAE
    z=mu + CNN attribution; matmul/conv FLOPs only, elementwise excluded)."""
    enc = T * (2 * 4 * H * (D + H) + 2 * 4 * H * 2 * H)      # 2 LSTM layers
    heads = 2 * (Z * H + H * Z)                               # mu + z2h
    dec = 2 * 4 * H * H + T * (2 * 4 * H * H + 2 * 4 * H * 2 * H
                               + 2 * D * H)                   # const in + scan + head
    return float(enc + heads + dec + cnn_flops_per_window(T, D))


def load_trained_workload():
    """(vae, cnn, vae_params, cnn_vars, W, mean, std, thr) from the committed
    trained artifacts + real test windows, or None if absent."""
    from pathlib import Path

    root = Path(__file__).resolve().parent / "data" / "4dof"
    if not (root / "models" / "temporal_vae.msgpack").exists():
        return None
    import jax
    import jax.numpy as jnp

    from shm_tpu.cli.stage4dof import (
        Paths, _load_stats, _load_vae, build_fraction_windows,
    )
    from shm_tpu.config import Stage4DofConfig
    from shm_tpu.models import CNN4DOF
    from shm_tpu.utils.checkpoint import load_params
    from shm_tpu.utils.io import load_json

    from shm_tpu.models.cnn import inference_conv_impl

    cfg = Stage4DofConfig()
    paths = Paths(str(root))
    splits = load_json(paths.run_splits)
    mean, std = _load_stats(paths)
    vae, vae_params = _load_vae(paths, cfg)
    # native lax.conv for the inference CNN on TPU: +28% device-side over
    # im2col (same params/predictions; see models/cnn.py::inference_conv_impl)
    cnn = CNN4DOF(dropout=cfg.cnn.dropout, dtype=jnp.bfloat16,
                  conv_impl=inference_conv_impl())
    template = cnn.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((2, cfg.seq_len, cfg.num_features, 2)))
    cnn_vars = load_params(template, paths.models / "cnn.msgpack")
    thr = float(load_json(paths.processed / "vae_threshold.json")["threshold"])

    frac = cfg.test_frac
    groups = []
    for g in ("normal", "sensor_fault", "structural_fault"):
        files = splits.get(g, {}).get("files", [])
        if files:
            groups.append(build_fraction_windows(files, frac, cfg))
    W = np.concatenate(groups).astype(np.float32)
    return vae, cnn, vae_params, cnn_vars, W, mean, std, thr


def random_workload():
    import jax
    import jax.numpy as jnp

    from shm_tpu.config import Stage4DofConfig
    from shm_tpu.models import vae_from_config, CNN4DOF

    from shm_tpu.models.cnn import inference_conv_impl

    cfg = Stage4DofConfig()
    vae = vae_from_config(cfg.vae)
    cnn = CNN4DOF(dropout=cfg.cnn.dropout, dtype=jnp.bfloat16,
                  conv_impl=inference_conv_impl())
    key = jax.random.PRNGKey(0)
    vae_params = vae.init({"params": key},
                          jnp.zeros((2, SEQ_LEN, NUM_FEATURES)))["params"]
    cnn_vars = cnn.init({"params": key},
                        jnp.zeros((2, SEQ_LEN, NUM_FEATURES, 2)))
    W = np.random.default_rng(0).normal(
        size=(N_WINDOWS, SEQ_LEN, NUM_FEATURES)).astype(np.float32)
    mean = np.zeros((NUM_FEATURES,), np.float32)
    std = np.ones((NUM_FEATURES,), np.float32)
    return vae, cnn, vae_params, cnn_vars, W, mean, std, 1.2814


DEGRADED_ENV = "SHM_TPU_BENCH_DEGRADED"


def _tpu_responsive(timeout_s: float = 300.0) -> bool:
    """One bounded health probe of the default (TPU) backend, in a fresh
    subprocess.

    The remote-tunneled TPU can be DOWN outright (observed round 3): backend
    init raises UNAVAILABLE, or the FIRST dispatch hangs >20 min with ~0 CPU —
    an unbounded bench run would hang instead of printing its JSON line. The
    probe runs in a SUBPROCESS (not a daemon thread) so a hung attempt never
    poisons this process's jax client and retries each get a fresh client.
    Generous timeout: on slow-compiler days even a tiny reduce can take
    minutes through the remote compile tunnel.
    """
    import subprocess
    import sys

    code = ("import jax.numpy as jnp; "
            "print(float(jnp.ones((8, 128)).sum()))")
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              timeout=timeout_s, capture_output=True)
        return proc.returncode == 0 and b"1024" in proc.stdout
    except subprocess.TimeoutExpired:
        return False


def _tpu_responsive_with_retry() -> bool:
    """Retry the bounded tunnel probe across a budget before giving up.

    Round 3's lesson (VERDICT.md): the tunnel outage that degraded
    BENCH_r03 was transient, but bench.py gave up after ONE probe — so the
    recorded artifact was a CPU fallback even though the chip came back.
    Re-probe every ~60 s until SHM_TPU_BENCH_PROBE_BUDGET_S (default 1800 s)
    is exhausted; only then degrade. A live tunnel passes the first probe in
    seconds, so the healthy path pays nothing for this.
    """
    budget_s = float(os.environ.get("SHM_TPU_BENCH_PROBE_BUDGET_S", "1800"))
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        per_probe = min(300.0, max(30.0, deadline - time.monotonic()))
        if _tpu_responsive(per_probe):
            if attempt > 1:
                # stderr: stdout is contractually ONE JSON line
                print(f"[bench] TPU tunnel came back on probe {attempt}",
                      file=sys.stderr, flush=True)
            return True
        if time.monotonic() + 60.0 >= deadline:
            return False
        print(f"[bench] TPU probe {attempt} failed; retrying in 60 s "
              f"({deadline - time.monotonic():.0f} s of budget left)",
              file=sys.stderr, flush=True)
        time.sleep(60.0)


def _rerun_on_cpu_degraded() -> int:
    """Re-exec bench.py in a fresh subprocess pinned to XLA-CPU and relay
    its JSON line. A subprocess (not in-process fallback) because THIS
    interpreter was started under the axon sitecustomize, which pre-imports
    jax pinned to the TPU platform — the fresh process clears PYTHONPATH to
    skip it and sets JAX_PLATFORMS=cpu before any jax import."""
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_PLATFORM_NAME", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = ""
    env[DEGRADED_ENV] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
        cwd=os.path.dirname(os.path.abspath(__file__)), env=env)
    return proc.returncode


def bench_jax(workload, *, use_fused: bool = True, passes: int = PASSES,
              repeats: int = REPEATS, device_side: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    from shm_tpu.pipeline import make_hybrid_fn

    vae, cnn, vae_params, cnn_vars, W, mean, std, thr = workload
    # pad/trim to the canonical 5,440-window workload so rates are comparable
    if W.shape[0] < N_WINDOWS:
        reps = -(-N_WINDOWS // W.shape[0])
        W = np.concatenate([W] * reps)
    W = W[:N_WINDOWS]

    mean = jnp.asarray(mean)
    std = jnp.asarray(std)
    thr = jnp.float32(thr)
    # msgpack-loaded params are host numpy arrays — device_put ONCE, or every
    # call re-uploads them through the tunnel (measured: 30k vs 171k win/s)
    vae_params = jax.device_put(vae_params)
    cnn_vars = jax.device_put(cnn_vars)

    # fused Pallas VAE kernel (bf16 MXU) — verified against the XLA path on
    # trained artifacts: 100% gate/prediction agreement, <2e-4 rel MSE diff.
    # use_fused=False (degraded CPU fallback) takes the XLA path instead:
    # the Pallas kernel only runs interpreted (glacially) off-TPU.
    fn = make_hybrid_fn(vae, cnn, use_fused_vae=use_fused,
                        fused_dtype=jnp.bfloat16 if use_fused else None)

    def durations_for(Wn: np.ndarray, repeats: int) -> list:
        """Per-call full-run durations (seconds), compile excluded."""
        Wd = jax.device_put(jnp.asarray(Wn))
        out = fn(vae_params, cnn_vars, Wd, mean, std, thr)   # compile
        float(out.mse.sum())                                 # force completion
        # NOTE: a host readback per repeat is required for honest timing — on
        # the remote-tunneled TPU platform block_until_ready returns before
        # execution finishes; only a device->host fetch proves completion.
        durs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn(vae_params, cnn_vars, Wd, mean, std, thr)
            float(out.mse.sum())
            durs.append(time.perf_counter() - t0)
        return durs

    # headline: `passes` independent full measurement passes in one process
    # (same compiled program, fresh timing loops) — the recorded value is
    # the MEDIAN pass rate, with min/max as the run-to-run spread (VERDICT
    # r4 #1: every doc quotes the driver artifact; the spread keys make
    # tunnel variance visible in the artifact itself)
    pass_rates = []
    e2e_durs: list = []
    for _ in range(passes):
        durs = durations_for(W, repeats)
        e2e_durs += durs
        pass_rates.append(W.shape[0] / (sum(durs) / len(durs)))
    pass_rates.sort()
    e2e = pass_rates[len(pass_rates) // 2]
    # full-run p50 latency: the OTHER half of BASELINE.json's north-star
    # metric (the 5,440-window full-test-set pass the reference's
    # 06_test_full_pipeline.py:327-383 makes) — p50 over every timed
    # full-run call above, honest readback included
    p50_ms = float(np.percentile(np.asarray(e2e_durs), 50) * 1e3)
    # device-side estimate: 4x workload amortizes the remote-dispatch floor
    # (meaningless off-TPU, where there is no remote-dispatch floor — the
    # degraded fallback skips it)
    dev = None
    if device_side:
        durs4 = durations_for(np.concatenate([W] * 4), max(repeats // 2, 1))
        dev = 4 * W.shape[0] / (sum(durs4) / len(durs4))
    return {"end_to_end": e2e,
            "end_to_end_min": pass_rates[0],
            "end_to_end_max": pass_rates[-1],
            "full_run_p50_latency_ms": p50_ms,
            "device_side": dev}


def bench_mingru_device(W: np.ndarray, repeats: int = 5):
    """Device-side rate of the opt-in minGRU preset (fused Pallas kernel,
    ops/fused_mingru.py) on the same 4x workload, loaded from the committed
    data/4dof_mingru artifacts. SECONDARY metric only — the headline number
    stays the reference-parity LSTM; quality parity of this preset is
    measured in BENCHMARKS.md (accuracy 0.99395 vs 0.99367). Returns None
    when the artifacts are absent."""
    from pathlib import Path

    root = Path(__file__).resolve().parent / "data" / "4dof_mingru"
    if not (root / "models" / "temporal_vae.msgpack").exists():
        return None
    import jax
    import jax.numpy as jnp

    from shm_tpu.cli.stage4dof import Paths, _load_stats, _load_vae
    from shm_tpu.config import Stage4DofConfig, replace
    from shm_tpu.models import CNN4DOF
    from shm_tpu.models.cnn import inference_conv_impl
    from shm_tpu.pipeline import make_hybrid_fn
    from shm_tpu.utils.checkpoint import load_params
    from shm_tpu.utils.io import load_json

    cfg = Stage4DofConfig()
    cfg = replace(cfg, vae=replace(cfg.vae, cell="min_gru"))
    paths = Paths(str(root))
    mean, std = _load_stats(paths)
    vae, vae_params = _load_vae(paths, cfg)
    cnn = CNN4DOF(dropout=cfg.cnn.dropout, dtype=jnp.bfloat16,
                  conv_impl=inference_conv_impl())
    template = cnn.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((2, cfg.seq_len, cfg.num_features, 2)))
    cnn_vars = load_params(template, paths.models / "cnn.msgpack")
    thr = jnp.float32(
        load_json(paths.processed / "vae_threshold.json")["threshold"])
    vae_params = jax.device_put(vae_params)
    cnn_vars = jax.device_put(cnn_vars)
    fn = make_hybrid_fn(vae, cnn, use_fused_vae=True, fused_dtype=jnp.bfloat16)
    meanj, stdj = jnp.asarray(mean), jnp.asarray(std)
    Wd = jax.device_put(jnp.asarray(np.concatenate([W] * 4)))
    out = fn(vae_params, cnn_vars, Wd, meanj, stdj, thr)   # compile
    float(out.mse.sum())
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(vae_params, cnn_vars, Wd, meanj, stdj, thr)
        float(out.mse.sum())
    dt = (time.perf_counter() - t0) / repeats
    return Wd.shape[0] / dt


def bench_torch_cpu(W: np.ndarray, n_sub: int = 1088) -> float:
    """Reference-faithful torch-CPU hybrid pass (the baseline denominator)."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    torch.set_num_threads(max(torch.get_num_threads(), 1))

    class TVAE(nn.Module):
        def __init__(self, D=12, Z=16, H=128, L=2, p=0.3):
            super().__init__()
            self.enc = nn.LSTM(D, H, L, batch_first=True, dropout=p)
            self.ln = nn.LayerNorm(H)
            self.mu = nn.Linear(H, Z)
            self.lv = nn.Linear(H, Z)
            self.z2h = nn.Linear(Z, H)
            self.dec = nn.LSTM(H, H, L, batch_first=True, dropout=p)
            self.out = nn.Linear(H, D)

        def forward(self, x):
            _, (hn, _) = self.enc(x)
            h = self.ln(hn[-1])
            mu, lv = self.mu(h), self.lv(h)
            z = mu + torch.randn_like(mu) * torch.exp(0.5 * lv)
            h0 = torch.tanh(self.z2h(z)).unsqueeze(1).repeat(1, x.size(1), 1)
            d, _ = self.dec(h0)
            return self.out(d), mu, lv

    class CNN(nn.Module):
        def __init__(self):
            super().__init__()
            self.f = nn.Sequential(
                nn.Conv2d(2, 16, 3, padding=1), nn.BatchNorm2d(16), nn.ReLU(),
                nn.MaxPool2d(2),
                nn.Conv2d(16, 32, 3, padding=1), nn.BatchNorm2d(32), nn.ReLU(),
                nn.MaxPool2d(2), nn.Flatten(),
                nn.Linear(32 * 25 * 3, 128), nn.ReLU(), nn.Linear(128, 2))

        def forward(self, x):
            return self.f(x)

    vae = TVAE().eval()
    cnn = CNN().eval()
    X = torch.tensor(W[:n_sub])
    n_sub = X.shape[0]                # actual count (W may be shorter)
    thr = 1.2814
    BATCH = 512

    def one_pass() -> float:
        t0 = time.perf_counter()
        # pass 1: gate scores (06_test_full_pipeline.py:339-344)
        mses = []
        for i in range(0, n_sub, BATCH):
            xb = X[i:i + BATCH]
            xh, _, _ = vae(xb)
            mses.append(((xb - xh) ** 2).mean(dim=(1, 2)))
        mse = torch.cat(mses)
        idx = torch.where(mse > thr)[0]
        # pass 2 on anomalies + CNN (:359-371); random init -> usually all anomalous
        if idx.numel() == 0:
            idx = torch.arange(n_sub)
        for i in range(0, idx.numel(), BATCH):
            sel = idx[i:i + BATCH]
            xb = X[sel]
            xh, _, _ = vae(xb)
            xin = torch.stack([xb, (xb - xh) ** 2], dim=1)
            cnn(xin).argmax(dim=1)
        return time.perf_counter() - t0

    with torch.no_grad():
        vae(X[:BATCH])                # warmup
        dts = sorted(one_pass() for _ in range(3))
    return n_sub / dts[1]             # median of 3 (CPU-load robustness)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the measured loop "
                         "into DIR (TensorBoard-loadable); output contract "
                         "(one JSON line) is unchanged")
    args = ap.parse_args()

    degraded = os.environ.get(DEGRADED_ENV) == "1"
    if not degraded and os.environ.get("JAX_PLATFORMS", "").lower() != "cpu":
        # the default backend here is the remote-tunneled TPU; a dead tunnel
        # would hang the first dispatch indefinitely — probe (bounded, with
        # retries across a budget since outages are often transient), and on
        # failure produce the JSON line from a fresh CPU subprocess instead
        if not _tpu_responsive_with_retry():
            raise SystemExit(_rerun_on_cpu_degraded())

    import jax

    cpu_mode = degraded or jax.default_backend() == "cpu"

    workload = None
    try:
        workload = load_trained_workload()
    except Exception:
        workload = None
    trained = workload is not None
    if workload is None:
        workload = random_workload()

    # degraded/CPU run: XLA path (the Pallas kernel only runs interpreted
    # off-TPU), one short pass, no 4x device-side pass, no minGRU kernel
    bench_kw = (dict(use_fused=False, passes=1, repeats=3, device_side=False)
                if cpu_mode else {})
    if args.profile:
        from shm_tpu.utils.profiling import trace

        with trace(args.profile):
            rates = bench_jax(workload, **bench_kw)
    else:
        rates = bench_jax(workload, **bench_kw)
    mingru_dev = None
    if trained and not cpu_mode:
        try:
            W_canon = np.asarray(workload[4])
            reps = -(-N_WINDOWS // W_canon.shape[0])
            mingru_dev = bench_mingru_device(
                np.concatenate([W_canon] * reps)[:N_WINDOWS])
        except Exception:
            # the secondary metric must not sink the headline bench, but a
            # REAL failure (kernel regression, artifact mismatch) must stay
            # distinguishable from "artifacts absent" (None from the guard)
            import traceback

            traceback.print_exc()
            mingru_dev = None
    try:
        # strided subsample spanning the WHOLE set: preserves the
        # normal/sensor/structural mix (groups are concatenated, so a [:1088]
        # prefix would be all-normal and skip the gate's data-dependent
        # second pass). Ceil division so the stride never collapses to a
        # prefix when len(W) is between 1x and 2x the subsample size.
        W_full = np.asarray(workload[4])
        stride = max(-(-len(W_full) // 1088), 1)
        torch_rate = bench_torch_cpu(W_full[::stride][:1088])
    except Exception:
        torch_rate = float("nan")

    # canonical denominator: the PINNED idle-machine torch-CPU rate
    # (BASELINE.json "pinned_baseline") — the live rate above varies with
    # machine load, so it is reported as a secondary key only
    pinned = None
    try:
        from pathlib import Path

        with open(Path(__file__).resolve().parent / "BASELINE.json") as f:
            pinned = json.load(f)["pinned_baseline"]["torch_cpu_windows_per_sec"]
    except Exception:
        pinned = None
    vs_live = rates["end_to_end"] / torch_rate if torch_rate == torch_rate else None
    vs = rates["end_to_end"] / pinned if pinned else vs_live

    fpw = hybrid_flops_per_window()
    dev_rate = rates["device_side"]
    line = {
        "metric": "4dof_hybrid_inference_windows_per_sec",
        "value": round(rates["end_to_end"], 2),
        # run-to-run spread across the PASSES independent measurement passes
        # (value is the median pass); the spread IS the tunnel variance —
        # quote value, not value_max
        "value_min": round(rates["end_to_end_min"], 2),
        "value_max": round(rates["end_to_end_max"], 2),
        # p50 wall latency of one full 5,440-window run (the workload of
        # 4DOF/Scripts/06_test_full_pipeline.py:327-383), honest readback
        "full_run_p50_latency_ms": round(rates["full_run_p50_latency_ms"], 2),
        "unit": "windows/sec/chip",
        "platform": jax.default_backend(),
        # set when the TPU tunnel failed the bounded retried health probe and
        # this line was produced by the XLA-CPU fallback — NOT a TPU number
        "degraded": "tpu_tunnel_down_cpu_fallback" if degraded else None,
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "baseline_windows_per_sec_pinned": pinned,
        "vs_baseline_live": round(vs_live, 2) if vs_live is not None else None,
        "torch_cpu_windows_per_sec_live": (
            round(torch_rate, 2) if torch_rate == torch_rate else None),
        "trained_artifacts": trained,
        "flops_per_window": fpw,
        "mfu": round(rates["end_to_end"] * fpw / V5E_BF16_PEAK_FLOPS, 4),
        "device_side_windows_per_sec": (
            round(dev_rate, 2) if dev_rate is not None else None),
        "device_mfu": (round(dev_rate * fpw / V5E_BF16_PEAK_FLOPS, 4)
                       if dev_rate is not None else None),
        # opt-in minGRU preset (NON-parity model family, measured quality
        # parity — BENCHMARKS.md); device-side, same 4x workload
        "mingru_device_side_windows_per_sec": (
            round(mingru_dev, 2) if mingru_dev is not None else None),
    }
    if degraded:
        # a fallback must be UNMISTAKABLE: null every headline key a consumer
        # might read without checking "degraded" (round 3's artifact published
        # a 0.87x CPU rate in the same keys a 400x TPU run uses — VERDICT.md);
        # the CPU measurement moves to explicitly-degraded keys instead
        line["degraded_cpu_windows_per_sec"] = line["value"]
        line["degraded_cpu_vs_baseline"] = line["vs_baseline"]
        for k in ("value", "value_min", "value_max",
                  "full_run_p50_latency_ms", "vs_baseline",
                  "vs_baseline_live", "mfu"):
            line[k] = None
    print(json.dumps(line))


if __name__ == "__main__":
    main()
