"""Stage 2 (4DOF) pipeline CLI — the reference's numbered scripts as subcommands.

Mirrors ``4DOF/Scripts/00..06`` with reference-compatible artifacts:

    python -m shm_tpu.cli.stage4dof gen-normal     # 01_generate_normal_runs
    python -m shm_tpu.cli.stage4dof gen-faults     # 02_generate_fault_datasets
    python -m shm_tpu.cli.stage4dof make-splits    # 00_make_run_splits
    python -m shm_tpu.cli.stage4dof train-vae      # 03_train_vae
    python -m shm_tpu.cli.stage4dof threshold      # 04_vae_thresholding
    python -m shm_tpu.cli.stage4dof train-cnn      # 05_train_cnn
    python -m shm_tpu.cli.stage4dof test-pipeline  # 06_test_full_pipeline
    python -m shm_tpu.cli.stage4dof all            # the whole chain

Artifact layout under ``--root`` (default ./data/4dof) follows the reference:
``raw/normal/*.csv``, ``raw/faults/{sensor_fault,structural_fault}/*/*.csv``,
``processed/run_splits.json``, ``processed/{vae_mean,vae_std}.npy``,
``processed/normal_stats.npz``, ``processed/vae_threshold.json``,
``models/temporal_vae.msgpack``, ``models/cnn.msgpack``, ``figures/*``.

Unlike the reference (sequential host loops, double VAE pass, per-script process
boundaries), simulation is one vmapped device call, training epochs are single
jitted scans, and the test pipeline runs the fused one-pass gate->attribution.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from shm_tpu.config import Stage4DofConfig, replace
from shm_tpu.data import (
    make_windows, compute_mean_std_from_windows, normalize_windows, slice_frac,
)
from shm_tpu.data.splits import make_run_splits_json
from shm_tpu.models import vae_from_config, CNN4DOF
from shm_tpu.models.cnn import stack_vae_residual_nhwc
from shm_tpu.pipeline import make_hybrid_fn, run_hybrid_batched
from shm_tpu.calibrate import percentile_threshold, summarize_scores
from shm_tpu.evals import (
    confusion_matrix, accuracy, precision_recall_fscore, binary_prf,
    roc_curve, auc, average_precision_score, precision_recall_curve,
    classification_report_dict,
)
from shm_tpu.sim import (
    simulate_runs, smoothed_gaussian_force_np, inject_sensor_fault_triplet,
)
from shm_tpu.sim.faults import SENSOR_FAULT_CASES
from shm_tpu.train import train_vae, reconstruction_mse, train_cnn
from shm_tpu.utils.io import ensure_dir, save_json, load_json, save_npy, load_csv_numeric
from shm_tpu.utils.checkpoint import save_params, load_params

CLASS_NAMES = ["Normal", "Sensor Fault", "Structural Fault"]
COLUMNS = [f"x{j}" for j in range(1, 5)] + [f"v{j}" for j in range(1, 5)] + \
          [f"a{j}" for j in range(1, 5)]


# ---------------------------------------------------------------------------
# paths
# ---------------------------------------------------------------------------

class Paths:
    def __init__(self, root: str):
        self.root = Path(root)
        self.raw_normal = self.root / "raw" / "normal"
        self.raw_sensor = self.root / "raw" / "faults" / "sensor_fault"
        self.raw_struct = self.root / "raw" / "faults" / "structural_fault"
        self.processed = self.root / "processed"
        self.models = self.root / "models"
        self.figures = self.root / "figures"

    @property
    def run_splits(self) -> Path:
        return self.processed / "run_splits.json"


def _write_run_csv(arr: np.ndarray, path: Path) -> None:
    ensure_dir(path.parent)
    header = ",".join(COLUMNS)
    np.savetxt(path, arr, delimiter=",", header=header, comments="", fmt="%.10g")


# ---------------------------------------------------------------------------
# data generation (01, 02)
# ---------------------------------------------------------------------------

def cmd_gen_normal(paths: Paths, cfg: Stage4DofConfig, plot: bool = True) -> None:
    """10 healthy runs, per-run +-2% mass/stiffness jitter, zeta~U(0.015,0.025)
    (01_generate_normal_runs.py:115-129). All runs integrate in ONE vmapped call.

    Jitter RNG note: the reference draws jitter from the NumPy global RNG whose
    state is left over from the previous run's force seeding (and is unseeded for
    run 0) — i.e. run-0 jitter is non-reproducible upstream. Here jitter uses a
    dedicated ``default_rng(base_seed)`` stream: same distribution, reproducible.
    """
    R = cfg.n_normal_runs
    seeds = [cfg.base_seed + i for i in range(R)]
    rng = np.random.default_rng(cfg.base_seed)
    base_m = np.array(cfg.system.mass)
    base_k = np.array(cfg.system.stiffness)
    mass = base_m * rng.uniform(cfg.jitter_lo, cfg.jitter_hi, (R, 4))
    stiff = base_k * rng.uniform(cfg.jitter_lo, cfg.jitter_hi, (R, 4))
    zeta = rng.uniform(cfg.zeta_lo, cfg.zeta_hi, R)
    forces = np.stack([
        smoothed_gaussian_force_np(cfg.system.t_total, cfg.system.dt, 4,
                                   cfg.normal_force_rms, s) for s in seeds
    ])
    t0 = time.perf_counter()
    runs = np.asarray(simulate_runs(mass, stiff, zeta, forces, cfg.system))
    print(f"[sim] {R} normal runs in {time.perf_counter() - t0:.2f}s "
          f"(batched Newmark scan)")
    for s, run in zip(seeds, runs):
        _write_run_csv(run, paths.raw_normal / f"normal_seed{s}.csv")
        print(f"[OK] normal run saved: raw/normal/normal_seed{s}.csv")
    if plot:
        from shm_tpu.report import plot_stacked_channels
        t = np.arange(runs.shape[1]) * cfg.system.dt
        rep = runs[0]
        plot_stacked_channels(
            t, {f"x{j+1} [m]": rep[:, j] for j in range(4)},
            paths.figures, f"normal_run_seed{seeds[0]}_displacement_stacked")


def cmd_gen_faults(paths: Paths, cfg: Stage4DofConfig, plot: bool = True,
                   legacy: bool = False) -> None:
    """Structural faults (stiffness x{0.9,0.8,0.7,0.6} re-simulated) and sensor
    faults (noise/spikes/drift/bias on one DOF triplet of the nominal run)
    (02_generate_fault_datasets.py). All structural cases integrate in one batch.

    ``legacy``: generate the reference's COMMITTED-tree regime instead
    (stiff_red_{8,9,18,19,30,40}pct) — the mild 8/9/18/19 % cases are the
    ones where the gate does not saturate and quality comparison is
    meaningful (VERDICT r3 #5; FaultGenConfig.legacy_stiffness_scales).
    """
    f = cfg.faults
    force = smoothed_gaussian_force_np(cfg.system.t_total, cfg.system.dt, 4,
                                       f.force_rms, f.force_seed)
    base_m = np.array(cfg.system.mass)
    base_k = np.array(cfg.system.stiffness)

    # nominal + all structural scales in one vmapped batch
    struct_scales = (f.legacy_stiffness_scales if legacy
                     else f.stiffness_scales)
    scales = np.array((1.0,) + tuple(struct_scales))
    S = len(scales)
    runs = np.asarray(simulate_runs(
        np.tile(base_m, (S, 1)), base_k[None] * scales[:, None],
        np.full(S, cfg.system.damping_ratio), np.tile(force[None], (S, 1, 1)),
        cfg.system))
    nominal = runs[0]

    labels = [f"stiff_red_{int(round((1.0 - s) * 100))}pct"
              for s in scales[1:]]
    # a root can be re-generated under the OTHER regime (--legacy-faults vs
    # the default); stale case dirs would silently mix regimes in
    # make-splits' rglob and corrupt every downstream metric — remove them.
    # Deletion is restricted to the union of the two KNOWN regimes' label
    # sets: a user-placed custom case (e.g. a hand-simulated
    # stiff_red_50pct) is never destroyed — it is reported and skipped,
    # since make-splits would still pick it up.
    if paths.raw_struct.exists():
        import shutil

        known = {f"stiff_red_{int(round((1.0 - s) * 100))}pct"
                 for s in tuple(f.stiffness_scales)
                 + tuple(f.legacy_stiffness_scales)}
        for d in sorted(paths.raw_struct.iterdir()):
            if not (d.is_dir() and d.name.startswith("stiff_red_")
                    and d.name not in labels):
                continue
            if d.name in known:
                shutil.rmtree(d)
                print(f"[OK] removed stale structural case from the other "
                      f"regime: {d.name}")
            else:
                print(f"[WARN] unrecognized structural case dir kept: "
                      f"{d.name} (not in either known regime; remove it "
                      f"manually if it should not feed make-splits)")
    for label, run in zip(labels, runs[1:]):
        _write_run_csv(run, paths.raw_struct / label / f"{label}.csv")
        print(f"[OK] structural fault saved: {label}")

    key = jax.random.PRNGKey(f.force_seed)
    rel = {"noise": f.noise_rel_mag, "spikes": f.spikes_rel_mag,
           "drift": f.drift_rel_mag, "bias": f.bias_rel_mag}
    nominal_j = jnp.asarray(nominal)
    sensor_runs = {}
    for i, (name, kind, dof, _) in enumerate(SENSOR_FAULT_CASES):
        out = np.asarray(inject_sensor_fault_triplet(
            jax.random.fold_in(key, i), nominal_j, kind, dof, rel[kind],
            spikes_freq=f.spikes_freq))
        sensor_runs[name] = out
        _write_run_csv(out, paths.raw_sensor / name / f"{name}.csv")
        print(f"[OK] sensor fault saved: {name} (target=x{dof})")

    if plot:
        # normal-vs-fault displacement overlays, one per case
        # (02_generate_fault_datasets.py stacked comparison figures)
        from shm_tpu.report import plot_reconstruction_overlay
        t = np.arange(nominal.shape[0]) * cfg.system.dt
        for scale, run in zip(scales[1:], runs[1:]):
            label = f"stiff_red_{int(round((1.0 - scale) * 100))}pct"
            plot_reconstruction_overlay(
                t, {f"x{j+1} [m]": nominal[:, j] for j in range(4)},
                {f"x{j+1} [m]": run[:, j] for j in range(4)},
                paths.figures / "faults" / "structural_fault" / label,
                f"{label}_normal_vs_structural_fault_displacement_stacked",
                labels=("Normal", "Structural fault"))
        for name, run in sensor_runs.items():
            plot_reconstruction_overlay(
                t, {f"x{j+1} [m]": nominal[:, j] for j in range(4)},
                {f"x{j+1} [m]": run[:, j] for j in range(4)},
                paths.figures / "faults" / "sensor_fault" / name,
                f"{name}_normal_vs_sensor_fault_displacement_stacked",
                labels=("Normal", "Sensor fault"))


# ---------------------------------------------------------------------------
# splits (00)
# ---------------------------------------------------------------------------

def _count_rows_csv(path: Path) -> int:
    with open(path, "r", encoding="utf-8", errors="ignore") as fh:
        return max(sum(1 for _ in fh) - 1, 0)


def _scan(dirpath: Path) -> List[Tuple[str, int]]:
    return [(p.as_posix(), _count_rows_csv(p)) for p in sorted(dirpath.rglob("*.csv"))]


def cmd_make_splits(paths: Paths, cfg: Stage4DofConfig) -> None:
    doc = make_run_splits_json(
        _scan(paths.raw_normal), _scan(paths.raw_sensor), _scan(paths.raw_struct),
        seq_len=cfg.seq_len, stride=cfg.stride,
    )
    save_json(doc, paths.run_splits)
    print(f"[OK] wrote: {paths.run_splits}")
    print(f"[OK] totals: {doc['totals']}")


# ---------------------------------------------------------------------------
# VAE training (03)
# ---------------------------------------------------------------------------

def build_fraction_windows_multi(files: List[str], fracs,
                                 cfg: Stage4DofConfig) -> List[np.ndarray]:
    """Per-run time-fraction slices BEFORE windowing (03_train_vae.py:164-174)
    for SEVERAL fractions with ONE CSV parse per run — host CSV parsing
    dominates this step's wall time (utils/io.py), so callers needing both
    the train and val fractions must not parse every file twice."""
    outs: List[List[np.ndarray]] = [[] for _ in fracs]
    for fp in files:
        X = load_csv_numeric(fp, cfg.num_features)
        for out, frac in zip(outs, fracs):
            Xs = slice_frac(X, frac)
            W = make_windows(jnp.asarray(Xs), cfg.seq_len, cfg.stride)
            if W.shape[0]:
                out.append(np.asarray(W))
    return [np.concatenate(o).astype(np.float32) if o else
            np.zeros((0, cfg.seq_len, cfg.num_features), np.float32)
            for o in outs]


def build_fraction_windows(files: List[str], frac, cfg: Stage4DofConfig) -> np.ndarray:
    """Single-fraction convenience wrapper over build_fraction_windows_multi."""
    return build_fraction_windows_multi(files, (frac,), cfg)[0]


def cmd_train_vae(paths: Paths, cfg: Stage4DofConfig, epochs: int | None = None,
                  seed: int | None = None, kernel: bool | None = None,
                  devices: int | None = None) -> None:
    splits = load_json(paths.run_splits)
    normal_files = splits["normal"]["files"]

    Wtr, Wva = build_fraction_windows_multi(
        normal_files, (cfg.train_frac, cfg.val_frac), cfg)
    print(f"[INFO] normal windows train/val = {Wtr.shape[0]}/{Wva.shape[0]}")
    if not Wtr.shape[0] or not Wva.shape[0]:
        raise RuntimeError("No normal train/val windows. Run gen-normal + make-splits.")

    mean, std = compute_mean_std_from_windows(jnp.asarray(Wtr))
    mean_np, std_np = np.asarray(mean), np.asarray(std)
    save_npy(mean_np, paths.processed / "vae_mean.npy")
    save_npy(std_np, paths.processed / "vae_std.npy")
    ensure_dir(paths.processed)
    np.savez(paths.processed / "normal_stats.npz", mean=mean_np, std=std_np)

    Ztr = np.asarray(normalize_windows(jnp.asarray(Wtr), mean, std))
    Zva = np.asarray(normalize_windows(jnp.asarray(Wva), mean, std))

    tcfg = cfg.vae_train if epochs is None else replace(cfg.vae_train, epochs=epochs)
    if seed is not None:
        tcfg = replace(tcfg, seed=seed)
    vae = vae_from_config(cfg.vae)
    from shm_tpu.parallel import make_mesh_opt
    mesh = make_mesh_opt(devices)
    if kernel is None:
        # default: the custom-VJP fused LSTM training kernels on TPU backends
        # (fastest path; equivalent RNG stream, seed-stability table in
        # BENCHMARKS.md). CPU keeps the XLA path (no Mosaic compiler there).
        # With --devices the XLA path is required (train_vae mesh= uses GSPMD
        # auto-partitioning, which cannot split Pallas custom calls); with
        # --cell min_gru the XLA path IS the fast path (parallel scan).
        from shm_tpu.ops import is_tpu_backend

        kernel = (mesh is None and cfg.vae.cell == "lstm"
                  and is_tpu_backend())
    if mesh is not None:
        print(f"[INFO] data-parallel training over {mesh.devices.size} devices")
    res = train_vae(vae, Ztr, Zva, tcfg, log_every=1, use_pallas_kernel=kernel,
                    mesh=mesh)

    save_params({"params": res.params}, paths.models / "temporal_vae.msgpack")
    meta = {
        "seed": tcfg.seed, "window_len": cfg.seq_len, "stride": cfg.stride,
        "train_frac": list(cfg.train_frac), "val_frac": list(cfg.val_frac),
        "epochs": tcfg.epochs, "batch_size": tcfg.batch_size,
        "latent_dim": cfg.vae.latent_dim, "hidden_dim": cfg.vae.hidden_dim,
        "num_layers": cfg.vae.num_layers, "dropout": cfg.vae.dropout,
        "cell": cfg.vae.cell,
        "kl_warmup_ratio": tcfg.kl_warmup_ratio,
        "best_val_total": res.best_val, "best_epoch": res.best_epoch,
        "train_seconds": res.seconds,
        "protocol": "fraction slicing before windowing; stats from normal/train "
                    "fraction only; VAE trained on normal/train fraction only.",
    }
    save_json(meta, paths.processed / "stage1_vae_train_meta.json")
    from shm_tpu.report import plot_loss_curves
    plot_loss_curves(res.history, paths.figures, "vae_training_curves")
    print(f"[OK] saved: models/temporal_vae.msgpack (best epoch {res.best_epoch}, "
          f"val {res.best_val:.6f}, {res.seconds:.1f}s)")


def _load_vae(paths: Paths, cfg: Stage4DofConfig):
    # the trainer records the recurrence family in its meta manifest; a
    # mismatched cell cannot restore (min_gru carries [D,2H] w_ih and no
    # w_hh where the LSTM has [D,4H]+w_hh), so detect it here — threshold/
    # test-pipeline/serving all work without re-passing --cell
    meta_path = paths.processed / "stage1_vae_train_meta.json"
    vcfg = cfg.vae
    if meta_path.exists():
        cell = load_json(meta_path).get("cell", "lstm")
        if cell != vcfg.cell:
            vcfg = replace(vcfg, cell=cell)
    vae = vae_from_config(vcfg)
    template = vae.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((2, cfg.seq_len, cfg.num_features)))
    restored = load_params({"params": template["params"]},
                           paths.models / "temporal_vae.msgpack")
    return vae, restored["params"]


def _load_stats(paths: Paths) -> Tuple[np.ndarray, np.ndarray]:
    d = np.load(paths.processed / "normal_stats.npz")
    mean = d["mean"].astype(np.float32)
    std = d["std"].astype(np.float32)
    std[std == 0] = 1e-6
    return mean, std


# ---------------------------------------------------------------------------
# thresholding (04)
# ---------------------------------------------------------------------------

def cmd_threshold(paths: Paths, cfg: Stage4DofConfig, sample: bool = False) -> None:
    splits = load_json(paths.run_splits)
    mean, std = _load_stats(paths)
    vae, vae_params = _load_vae(paths, cfg)

    frac = cfg.val_frac
    Wn = build_fraction_windows(splits["normal"]["files"], frac, cfg)
    Ws = build_fraction_windows(splits.get("sensor_fault", {}).get("files", []), frac, cfg)
    Wst = build_fraction_windows(splits.get("structural_fault", {}).get("files", []), frac, cfg)
    if Wn.shape[0] == 0:
        raise RuntimeError("No normal windows for threshold fit.")

    # ONE concatenated scoring program for all three groups: each distinct
    # batch shape costs a fresh remote compile (30s-5min through the tunnel),
    # so per-group calls triple both the dispatch floor and the compile count.
    # NOTE (sample=True only): the single PRNGKey now streams noise across the
    # concatenated stack, so per-window draws differ from the earlier
    # per-group-call scoring under the same key — a trajectory change in the
    # non-default stochastic mode only; the default deterministic scores and
    # the threshold policy are unaffected.
    Wall = np.concatenate([g for g in (Wn, Ws, Wst) if g.shape[0]]) \
        if (Ws.shape[0] or Wst.shape[0]) else Wn
    Zall = normalize_windows(jnp.asarray(Wall), jnp.asarray(mean), jnp.asarray(std))
    s_all = reconstruction_mse(vae, vae_params, Zall, sample=sample,
                               key=jax.random.PRNGKey(0))
    s_n = s_all[: Wn.shape[0]]
    s_s = s_all[Wn.shape[0]: Wn.shape[0] + Ws.shape[0]]
    s_st = s_all[Wn.shape[0] + Ws.shape[0]:]
    thr = percentile_threshold(s_n, cfg.threshold_percentile)

    out = {
        "threshold": thr,
        "percentile": cfg.threshold_percentile,
        "window_len": cfg.seq_len,
        "stride": cfg.stride,
        "fit_data": f"normal fraction {tuple(frac)} only",
        "score_def": "full_window_mse_mean_over_time_and_features",
        "healthy_frac": list(frac),
        "n_val_windows_normal": int(s_n.size),
        "n_val_windows_sensor": int(s_s.size),
        "n_val_windows_structural": int(s_st.size),
        "seed": cfg.vae_train.seed,
        "stochastic_eval": bool(sample),
        "score_summary": {
            "normal_val": summarize_scores(s_n),
            "sensor_val": summarize_scores(s_s),
            "structural_val": summarize_scores(s_st),
        },
    }
    save_json(out, paths.processed / "vae_threshold.json")

    from shm_tpu.report import plot_score_hist, plot_roc, plot_pr_curve
    groups = {"Normal": s_n, "Sensor Fault": s_s, "Structural Fault": s_st}
    plot_score_hist(groups, thr, paths.figures, "vae_scores_hist_linear")
    plot_score_hist(groups, thr, paths.figures, "vae_scores_hist_logx", log_x=True)
    if s_s.size + s_st.size:
        y = np.r_[np.zeros_like(s_n), np.ones(s_s.size + s_st.size)]
        s = np.r_[s_n, s_s, s_st]
        fpr, tpr, _ = roc_curve(y, s)
        plot_roc({"VAE gate": (fpr, tpr, auc(fpr, tpr))}, paths.figures,
                 "vae_gate_roc_curve")
        prec, rec, _ = precision_recall_curve(y, s)
        plot_pr_curve(prec, rec, average_precision_score(y, s), paths.figures,
                      "vae_gate_pr_curve", "VAE Gate (Normal vs Fault)")
    print(f"[OK] Threshold saved: {thr:.6f} (p{cfg.threshold_percentile:g} of "
          f"{s_n.size} healthy-val windows)")


# ---------------------------------------------------------------------------
# CNN training (05)
# ---------------------------------------------------------------------------

def build_split_windows(group: Dict, split: str, cfg: Stage4DofConfig) -> np.ndarray:
    """Collect windows by run_splits window INDICES (05_train_cnn.py:159-171)."""
    out = []
    for fp in group["files"]:
        idx = group["window_indices"][fp][split]
        if not idx:
            continue
        X = load_csv_numeric(fp, cfg.num_features)
        W = np.asarray(make_windows(jnp.asarray(X), cfg.seq_len, cfg.stride))
        out.append(W[np.asarray(idx)])
    if not out:
        return np.zeros((0, cfg.seq_len, cfg.num_features), np.float32)
    return np.concatenate(out).astype(np.float32)


def _cnn_inputs(vae, vae_params, Z: np.ndarray, batch: int = 4096) -> np.ndarray:
    """2-channel [Z, residual^2] NHWC inputs from ONE frozen-VAE pass
    (05_train_cnn.py:118-141)."""
    outs = []
    for i in range(0, len(Z), batch):
        zb = jnp.asarray(Z[i:i + batch])
        recon, _, _ = vae.apply({"params": vae_params}, zb)
        outs.append(np.asarray(stack_vae_residual_nhwc(zb, recon)))
    return np.concatenate(outs) if outs else np.zeros((0,) + Z.shape[1:] + (2,), np.float32)


def cmd_train_cnn(paths: Paths, cfg: Stage4DofConfig, epochs: int | None = None,
                  seed: int | None = None, devices: int | None = None) -> None:
    splits = load_json(paths.run_splits)
    mean, std = _load_stats(paths)
    vae, vae_params = _load_vae(paths, cfg)

    sets = {}
    for split in ("train", "val"):
        Ws = build_split_windows(splits["sensor_fault"], split, cfg)
        Wt = build_split_windows(splits["structural_fault"], split, cfg)
        Z = np.asarray(normalize_windows(jnp.asarray(np.concatenate([Ws, Wt])),
                                         jnp.asarray(mean), jnp.asarray(std)))
        y = np.r_[np.zeros(len(Ws), np.int32), np.ones(len(Wt), np.int32)]
        # deterministic permutation shuffle (05_train_cnn.py:238-242)
        perm = np.random.RandomState(cfg.cnn_train.seed).permutation(len(Z))
        sets[split] = (Z[perm], y[perm])
        print(f"[INFO] {split}: sensor={len(Ws)} structural={len(Wt)}")

    Xtr = _cnn_inputs(vae, vae_params, sets["train"][0])
    Xva = _cnn_inputs(vae, vae_params, sets["val"][0])
    ytr, yva = sets["train"][1], sets["val"][1]

    tcfg = cfg.cnn_train if epochs is None else replace(cfg.cnn_train, epochs=epochs)
    if seed is not None:
        tcfg = replace(tcfg, seed=seed)
    cnn = CNN4DOF(dropout=cfg.cnn.dropout)
    from shm_tpu.parallel import make_mesh_opt
    mesh = make_mesh_opt(devices)
    if mesh is not None:
        print(f"[INFO] data-parallel training over {mesh.devices.size} devices")
    res = train_cnn(cnn, Xtr, ytr, Xva, yva, tcfg, log_every=1, mesh=mesh)

    save_params(res.variables, paths.models / "cnn.msgpack")
    meta = {
        "seed": tcfg.seed, "epochs": tcfg.epochs, "batch_size": tcfg.batch_size,
        "lr": tcfg.lr, "weight_decay": tcfg.weight_decay,
        "early_stop_patience": tcfg.early_stop_patience,
        "best_val_ce": res.best_val, "best_epoch": res.best_epoch,
        "stopped_epoch": res.stopped_epoch, "train_seconds": res.seconds,
        "input_def": "stack([Z, (Z - Z_hat)^2], channel-last), frozen best-val VAE",
        "labels": {"sensor_fault": 0, "structural_fault": 1},
    }
    save_json(meta, paths.processed / "stage2_cnn_train_meta.json")
    from shm_tpu.report import plot_loss_curves
    plot_loss_curves(res.history, paths.figures, "cnn_training_curves",
                     keys=(("train_loss", "Train"), ("val_loss", "Val")))
    print(f"[OK] saved: models/cnn.msgpack (best epoch {res.best_epoch}, "
          f"val CE {res.best_val:.6f}, {res.seconds:.1f}s)")


# ---------------------------------------------------------------------------
# full pipeline test (06)
# ---------------------------------------------------------------------------

def cmd_test_pipeline(paths: Paths, cfg: Stage4DofConfig) -> None:
    from shm_tpu.models.cnn import inference_conv_impl

    splits = load_json(paths.run_splits)
    mean, std = _load_stats(paths)
    vae, vae_params = _load_vae(paths, cfg)
    # pure inference: native lax.conv on TPU (+28% device-side; identical
    # param tree and predictions — models/cnn.py::inference_conv_impl)
    cnn = CNN4DOF(dropout=cfg.cnn.dropout, conv_impl=inference_conv_impl())
    template = cnn.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((2, cfg.seq_len, cfg.num_features, 2)))
    cnn_vars = load_params(template, paths.models / "cnn.msgpack")
    thr = load_json(paths.processed / "vae_threshold.json")["threshold"]

    hybrid = make_hybrid_fn(vae, cnn)

    groups = [("normal", 0, "normal/test"), ("sensor_fault", 1, "sensor/test"),
              ("structural_fault", 2, "struct/test")]
    group_W, group_meta = [], []
    for gname, gt, tag in groups:
        W = build_fraction_windows(splits[gname]["files"], cfg.test_frac, cfg)
        if W.shape[0] == 0:
            print(f"[WARN] {tag}: no test windows")
            continue
        group_W.append(W)
        group_meta.append((gt, tag, W.shape[0]))
    if not group_W:
        raise RuntimeError("No test windows in any group.")
    n_windows = sum(n for _, _, n in group_meta)

    # ONE fused device program over all groups (distinct per-group batch
    # shapes would each cost a fresh remote compile + dispatch floor)
    t0 = time.perf_counter()
    out = run_hybrid_batched(hybrid, vae_params, cnn_vars,
                             np.concatenate(group_W), mean, std, thr)
    infer_seconds = time.perf_counter() - t0

    y_true = np.concatenate([np.full(n, gt, np.int64)
                             for gt, _, n in group_meta])
    y_pred = out["y_pred"].astype(np.int64)
    gate_scores = out["mse"]
    gate_labels = (y_true != 0).astype(np.int64)
    hyb_scores = out["p_struct"]
    hyb_labels = (y_true == 2).astype(np.int64)

    gate_stats: Dict[str, Dict[str, float]] = {}
    ofs = 0
    for gt, tag, n in group_meta:
        anom = int(out["anomalous"][ofs:ofs + n].sum())
        ofs += n
        gate_stats[tag] = {"anom": float(anom), "total": float(n),
                           "anom_rate": float(anom / n)}
        print(f"[gate] {tag}: anom_rate={anom / n:.3f} (anom={anom}/{n})")

    acc = accuracy(y_true, y_pred)
    cm = confusion_matrix(y_true, y_pred, 3)
    print(f"[RESULT] 3-class window accuracy: {acc:.4f}")
    print("[CM] rows=GT (Normal, Sensor Fault, Structural Fault); cols=Pred")
    print(cm)

    prf = precision_recall_fscore(y_true, y_pred, 3)
    for i, name in enumerate(CLASS_NAMES):
        print(f"  - {name:18s}: P={prf['precision'][i]:.4f} | "
              f"R={prf['recall'][i]:.4f} | F1={prf['fscore'][i]:.4f} | "
              f"N={int(prf['support'][i])}")
    print(f"[PRF] Macro avg        : P={prf['macro'][0]:.4f} | "
          f"R={prf['macro'][1]:.4f} | F1={prf['macro'][2]:.4f}")

    report = classification_report_dict(y_true, y_pred, CLASS_NAMES)
    ensure_dir(paths.figures)
    lines = [f"{k}: {v}" for k, v in report.items()]
    (paths.figures / "pipeline_classification_report.txt").write_text(
        "\n".join(lines), encoding="utf-8")

    from shm_tpu.report import plot_cm_row_norm, plot_roc, plot_pr_curve
    plot_cm_row_norm(cm, CLASS_NAMES, paths.figures,
                     "pipeline_confusion_matrix_row_normalized")

    gate_metrics: Dict[str, float] = {}
    if np.unique(gate_labels).size == 2:
        gprec, grec, _ = precision_recall_curve(gate_labels, gate_scores)
        gap = average_precision_score(gate_labels, gate_scores)
        plot_pr_curve(gprec, grec, gap, paths.figures, "vae_gate_pr_curve",
                      "VAE Gate (Normal vs Fault)")
        gate_metrics["average_precision"] = gap
        gate_metrics.update(binary_prf(gate_labels,
                                       (gate_scores > thr).astype(np.int64)))

    hybrid_metrics: Dict[str, float] = {}
    if np.unique(hyb_labels).size == 2:
        hprec, hrec, _ = precision_recall_curve(hyb_labels, hyb_scores)
        hap = average_precision_score(hyb_labels, hyb_scores)
        plot_pr_curve(hprec, hrec, hap, paths.figures,
                      "hybrid_struct_vs_rest_pr_curve", "Hybrid (Structural vs Rest)")
        hybrid_metrics["average_precision"] = hap
        hybrid_metrics.update(binary_prf(hyb_labels,
                                         (hyb_scores >= 0.5).astype(np.int64)))

    roc_both: Dict[str, float] = {}
    if np.unique(gate_labels).size == 2 and np.unique(hyb_labels).size == 2:
        gf, gtp, _ = roc_curve(gate_labels, gate_scores)
        hf, htp, _ = roc_curve(hyb_labels, hyb_scores)
        g_auc, h_auc = auc(gf, gtp), auc(hf, htp)
        plot_roc({"VAE gate": (gf, gtp, g_auc),
                  "Hybrid struct-vs-rest": (hf, htp, h_auc)},
                 paths.figures, "roc_gate_vs_hybrid")
        roc_both = {"gate_auroc": g_auc, "hybrid_auroc": h_auc}

    metrics = {
        "accuracy": acc,
        "confusion_matrix_counts": cm.tolist(),
        "gate": {
            "threshold_mse": float(thr),
            "score_def": "full_window_mse_mean_over_time_and_features",
            "frac_range": list(cfg.test_frac),
            "gate_stats": gate_stats,
            **roc_both,
            **gate_metrics,
        },
        "hybrid_struct_vs_rest": {
            "definition": "Structural Fault (positive) vs {Normal, Sensor Fault}",
            "score": "p_struct (CNN softmax on anomalies; 0 otherwise)",
            **hybrid_metrics,
        },
        "window_len": cfg.seq_len,
        "stride": cfg.stride,
        "seed": cfg.vae_train.seed,
        "throughput": {
            "n_windows": int(n_windows),
            "seconds": infer_seconds,
            "windows_per_sec": n_windows / infer_seconds if infer_seconds else None,
        },
    }
    save_json(metrics, paths.figures / "pipeline_metrics.json")
    save_json(metrics["gate"], paths.figures / "vae_gate_binary_metrics.json")
    save_json(metrics["hybrid_struct_vs_rest"],
              paths.figures / "hybrid_struct_vs_rest_metrics.json")
    print(f"[OK] wrote: figures/pipeline_metrics.json "
          f"({n_windows} windows in {infer_seconds:.2f}s = "
          f"{n_windows / infer_seconds:,.0f} win/s, fused single-pass)")


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="shm_tpu.cli.stage4dof", description=__doc__)
    ap.add_argument("command", choices=[
        "gen-normal", "gen-faults", "make-splits", "train-vae", "threshold",
        "train-cnn", "test-pipeline", "all"])
    ap.add_argument("--root", default="data/4dof")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override epoch count (train commands)")
    ap.add_argument("--no-plots", action="store_true")
    ap.add_argument("--sample", action="store_true",
                    help="stochastic VAE eval (reference parity) for threshold")
    ap.add_argument("--seed", type=int, default=None,
                    help="override training seed (train commands)")
    ap.add_argument("--kernel", dest="kernel", action="store_true", default=None,
                    help="train-vae: force the Pallas custom-VJP training "
                         "kernels (default: auto — on for TPU backends)")
    ap.add_argument("--no-kernel", dest="kernel", action="store_false",
                    help="train-vae: force the XLA training path")
    ap.add_argument("--devices", type=int, default=None,
                    help="data-parallel training over the first N local "
                         "devices (1-D mesh, batch sharded, grads psum'd; "
                         "trajectory matches single-device to reduction-order "
                         "tolerance)")
    ap.add_argument("--cell", choices=["lstm", "min_gru", "attention"],
                    default="lstm",
                    help="VAE temporal-stack family for train-vae (recorded "
                         "in the training meta; threshold/test-pipeline/"
                         "serving auto-detect it from there). Opt-in, NOT "
                         "the reference-parity model: min_gru (parallel-scan "
                         "cell, models/minrnn.py) is the measured throughput "
                         "lever; attention (transformer stack, "
                         "models/attention.py) is a quality-parity family "
                         "that scores SLOWER (bandwidth-bound XLA path); "
                         "BENCHMARKS.md")
    ap.add_argument("--legacy-faults", action="store_true",
                    help="gen-faults: generate the reference's COMMITTED-tree "
                         "structural regime (stiff_red_{8,9,18,19,30,40}pct) "
                         "instead of the current script spec's 10-40%% — the "
                         "mild cases are where gate quality is actually "
                         "comparable (BENCHMARKS.md legacy-regime table)")
    args = ap.parse_args(argv)

    cfg = Stage4DofConfig()
    if args.cell != "lstm":
        cfg = replace(cfg, vae=replace(cfg.vae, cell=args.cell))
    paths = Paths(args.root)
    plot = not args.no_plots

    steps = {
        "gen-normal": lambda: cmd_gen_normal(paths, cfg, plot),
        "gen-faults": lambda: cmd_gen_faults(paths, cfg, plot,
                                             legacy=args.legacy_faults),
        "make-splits": lambda: cmd_make_splits(paths, cfg),
        "train-vae": lambda: cmd_train_vae(paths, cfg, args.epochs,
                                           seed=args.seed,
                                           kernel=args.kernel,
                                           devices=args.devices),
        "threshold": lambda: cmd_threshold(paths, cfg, args.sample),
        "train-cnn": lambda: cmd_train_cnn(paths, cfg, args.epochs,
                                           seed=args.seed,
                                           devices=args.devices),
        "test-pipeline": lambda: cmd_test_pipeline(paths, cfg),
    }
    if args.command == "all":
        for name in ("gen-normal", "gen-faults", "make-splits", "train-vae",
                     "threshold", "train-cnn", "test-pipeline"):
            print(f"\n===== {name} =====")
            steps[name]()
    else:
        steps[args.command]()


if __name__ == "__main__":
    main()
