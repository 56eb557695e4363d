"""Stage 3 (openLAB / TU Dresden bridge) pipeline CLI — reference scripts 01..11.

    python -m shm_tpu.cli.openlab extract        # 01_extract_windows_and_labels
    python -m shm_tpu.cli.openlab make-splits    # 02_make_splits
    python -m shm_tpu.cli.openlab featurize      # 03_featurize_windows
    python -m shm_tpu.cli.openlab train-vae      # 04_train_vae
    python -m shm_tpu.cli.openlab validate-vae   # 05_validate_vae (threshold)
    python -m shm_tpu.cli.openlab train-cnn      # 06_train_cnn
    python -m shm_tpu.cli.openlab validate-cnn   # 07_validate_cnn (--split val|test)
    python -m shm_tpu.cli.openlab train-ml       # 08_train_ml_baselines
    python -m shm_tpu.cli.openlab validate-ml    # 09_validate_ml_baselines
    python -m shm_tpu.cli.openlab test-hybrid    # 10_test_hybrid_pipeline
    python -m shm_tpu.cli.openlab plots          # 11_generate_hybrid_pipeline_plot
    python -m shm_tpu.cli.openlab all

Raw MD_*.txt location: --raw-dir, else $SHM_TPU_OPENLAB_RAW, else the mounted
reference data. Artifacts under --root (default ./data/openlab):
``extracted/{X_clean.npy,X_raw.npy,window_labels.csv,run_split.json}``,
``features/{X_feat.npy,y.npy,feat_names.json}``, ``output/<Experiment>/...``.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from shm_tpu.config import OpenLabConfig, default_openlab_raw_dir, replace
from shm_tpu.calibrate import percentile_threshold, tune_threshold_st_first
from shm_tpu.data.features import FEATURE_LABEL_MAP, feature_names, featurize_windows
from shm_tpu.data.openlab import (
    LABEL_NORMAL, LABEL_SENSOR_FAULT, LABEL_STRUCT_FAULT, extract_all,
)
from shm_tpu.data.splits import run_based_split
from shm_tpu.evals import (
    accuracy, binary_prf, classification_report_dict, confusion_matrix,
    roc_auc_score,
)
from shm_tpu.models import CNNOpenLab, vae_from_config
from shm_tpu.models.ml import build_ml_models, get_prob_st
from shm_tpu.train import train_cnn, train_vae, reconstruction_mse
from shm_tpu.train.cnn import predict_probs
from shm_tpu.utils.checkpoint import load_params, save_params
from shm_tpu.utils.io import ensure_dir, load_json, save_json, save_npy

LABELS_3 = [LABEL_NORMAL, LABEL_SENSOR_FAULT, LABEL_STRUCT_FAULT]
CHANNELS_IDX = [1, 2, 3]   # LWA_2/3/4; DMS dropped (04_train_vae.py:54)


class Paths:
    def __init__(self, root: str, raw_dir: str):
        self.root = Path(root)
        self.raw_dir = raw_dir
        self.extracted = self.root / "extracted"
        self.features = self.root / "features"
        self.output = self.root / "output"
        self.vae_dir = self.output / "VAE_Training"
        self.vae_val_dir = self.output / "VAE_Validation_and_Thresholding"
        self.cnn_dir = self.output / "CNN_Training"
        self.cnn_val_dir = self.output / "CNN_Validation"
        self.ml_dir = self.output / "ML_Baselines"
        self.hybrid_dir = self.output / "Hybrid_Pipeline"


def standardize_clip(X: np.ndarray, mu: np.ndarray, sd: np.ndarray,
                     clip_z: float) -> np.ndarray:
    """(X - mu)/sd, clip to +-clip_z, then nan_to_num (Codes/04_train_vae.py:106-117)."""
    Xn = (X - mu[None, None, :]) / sd[None, None, :]
    Xn = np.clip(Xn, -clip_z, clip_z)
    return np.nan_to_num(Xn, nan=0.0, posinf=0.0, neginf=0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# 01 extract / 02 splits / 03 featurize
# ---------------------------------------------------------------------------

def cmd_extract(paths: Paths, cfg: OpenLabConfig) -> None:
    t0 = time.perf_counter()
    Xc, Xr, meta, diag = extract_all(paths.raw_dir, cfg)
    ensure_dir(paths.extracted)
    save_npy(Xc, paths.extracted / "X_clean.npy")
    save_npy(Xr, paths.extracted / "X_raw.npy")
    meta.to_csv(paths.extracted / "window_labels.csv", index=False)
    diag.to_csv(paths.extracted / "run_diagnostics.csv", index=False)
    print(f"X_clean: {Xc.shape}  X_raw: {Xr.shape}  meta: {meta.shape} "
          f"({time.perf_counter() - t0:.2f}s)")
    print(meta["label"].value_counts())


def _load_extracted(paths: Paths):
    import pandas as pd

    Xc = np.load(paths.extracted / "X_clean.npy").astype(np.float32)
    Xr = np.load(paths.extracted / "X_raw.npy").astype(np.float32)
    meta = pd.read_csv(paths.extracted / "window_labels.csv")
    if len(meta) != Xc.shape[0] or len(meta) != Xr.shape[0]:
        raise ValueError("Meta rows must match window tensors.")
    return Xc, Xr, meta


def cmd_make_splits(paths: Paths, cfg: OpenLabConfig,
                    min_normal_windows: int = 200) -> None:
    _, _, meta = _load_extracted(paths)
    runs = meta["run_id"].astype(str).unique().tolist()
    split = run_based_split(runs, seed=cfg.seed, train_frac=cfg.train_frac,
                            val_frac=cfg.val_frac)

    def count_normals(run_list):
        m = meta["run_id"].astype(str).isin(run_list) & (meta["label"] == LABEL_NORMAL)
        return int(m.sum())

    nN = {k: count_normals(v) for k, v in split.items()}
    if nN["train"] < min_normal_windows or nN["val"] < max(50, min_normal_windows // 4):
        raise RuntimeError(
            f"Insufficient Normal windows: train={nN['train']}, val={nN['val']}. "
            "Fix: change TRAIN_FRAC/VAL_FRAC or reduce min_normal_windows.")

    out = {
        "seed": cfg.seed,
        "fractions": {"train_frac": cfg.train_frac, "val_frac": cfg.val_frac,
                      "test_frac": cfg.test_frac},
        "train_runs": split["train"],
        "val_runs": split["val"],
        "test_runs": split["test"],
        "counts": {
            "n_runs": len(runs),
            "n_train_runs": len(split["train"]),
            "n_val_runs": len(split["val"]),
            "n_test_runs": len(split["test"]),
            "n_normal_train": nN["train"],
            "n_normal_val": nN["val"],
            "n_normal_test": nN["test"],
        },
    }
    save_json(out, paths.extracted / "run_split.json")
    print(f"[OK] run_split.json: {out['counts']}")


def cmd_featurize(paths: Paths, cfg: OpenLabConfig, include_freq: bool = True,
                  drop_sensor_fault: bool = False) -> None:
    _, Xr, meta = _load_extracted(paths)
    if drop_sensor_fault:
        keep = (meta["label"] != LABEL_SENSOR_FAULT).to_numpy()
        Xr, meta = Xr[keep], meta.loc[keep].reset_index(drop=True)
    t0 = time.perf_counter()
    X_feat = featurize_windows(Xr, include_freq=include_freq)
    y = meta["label"].map(FEATURE_LABEL_MAP).to_numpy(dtype=np.int64)
    ensure_dir(paths.features)
    save_npy(X_feat, paths.features / "X_feat.npy")
    save_npy(y, paths.features / "y.npy")
    meta.to_csv(paths.features / "meta_used.csv", index=False)
    chans = ["DMS_1", "LWA_2", "LWA_3", "LWA_4"]
    save_json({"feat_names": feature_names(chans, include_freq),
               "label_map": FEATURE_LABEL_MAP},
              paths.features / "feat_names.json")
    print(f"[OK] X_feat: {X_feat.shape} in {time.perf_counter() - t0:.2f}s "
          f"(vectorized; reference loops per window)")


# ---------------------------------------------------------------------------
# 04 train VAE / 05 validate + threshold
# ---------------------------------------------------------------------------

def cmd_train_vae(paths: Paths, cfg: OpenLabConfig, epochs: Optional[int] = None,
                  devices: Optional[int] = None) -> None:
    Xc, _, meta = _load_extracted(paths)
    split = load_json(paths.extracted / "run_split.json")
    train_runs = set(map(str, split["train_runs"]))
    mask = (meta["run_id"].astype(str).isin(train_runs)
            & (meta["label"] == LABEL_NORMAL)).to_numpy()
    Xtr = Xc[mask][:, :, CHANNELS_IDX]
    if Xtr.shape[0] < 200:
        raise ValueError(f"Too few TRAIN normal windows: {Xtr.shape[0]}.")

    mu = np.nanmean(Xtr, axis=(0, 1)).astype(np.float32)
    sd = np.nanstd(Xtr, axis=(0, 1)).astype(np.float32)
    sd = np.where(sd < 1e-12, 1.0, sd).astype(np.float32)
    art = ensure_dir(paths.vae_dir / "artifacts")
    save_npy(mu, art / "vae_clean_mean.npy")
    save_npy(sd, art / "vae_clean_std.npy")

    Z = standardize_clip(Xtr, mu, sd, cfg.standardize_clip)
    tcfg = cfg.vae_train if epochs is None else replace(cfg.vae_train, epochs=epochs)
    model = vae_from_config(cfg.vae)
    # reference trains with no val split and saves the FINAL model (04:343) —
    # parity preserved by saving last_params. The monitored slice is the first
    # 10% of the TRAINING set itself (curves only, NOT held out), so its
    # history keys are renamed train_subset_* to prevent best-val misreading.
    # epoch_chunk=10: the chunked middle ground measured in round 3
    # (tools/probe_epoch_chunks.py, openLAB shapes, same process): per-batch
    # loop 83.5s, K=10 chunks 10.1s, whole-run 9.0s — all bit-identical.
    # Round 2 pinned fused_epochs=False because the WHOLE-RUN compile cost
    # 155-200s on a slow remote-compiler day; a K=10 program is ~1/10th the
    # size, so chunking keeps the fused execution win while bounding the
    # slow-day compile exposure (fast-day whole-run compile is seconds —
    # the server's variance is documented in BENCHMARKS.md).
    from shm_tpu.parallel import make_mesh_opt
    mesh = make_mesh_opt(devices)
    if mesh is not None:
        print(f"[INFO] data-parallel training over {mesh.devices.size} devices")
    res = train_vae(model, Z, Z[: max(len(Z) // 10, 1)], tcfg, log_every=10,
                    fused_epochs=True, epoch_chunk=10, mesh=mesh)
    for k in ("total", "recon", "kl"):
        res.history[f"train_subset_{k}"] = res.history.pop(f"val_{k}")
    save_params({"params": res.last_params}, art / "vae_exceedance_clean.msgpack")

    manifest = {
        "seed": cfg.seed,
        "seq_len": cfg.seq_len,
        "channels_idx": CHANNELS_IDX,
        "normalization": {"clip_z": cfg.standardize_clip,
                          "mean_path": str(art / "vae_clean_mean.npy"),
                          "std_path": str(art / "vae_clean_std.npy")},
        "model": {"input_dim": len(CHANNELS_IDX), "latent_dim": cfg.vae.latent_dim,
                  "hidden_dim": cfg.vae.hidden_dim, "num_layers": cfg.vae.num_layers,
                  "dropout": cfg.vae.dropout, "cell": cfg.vae.cell},
        "optimizer": {"name": "Adam", "lr": tcfg.lr,
                      "weight_decay": tcfg.weight_decay,
                      "max_grad_norm": tcfg.grad_clip},
        "train": {"batch_size": tcfg.batch_size, "epochs": tcfg.epochs,
                  "train_normals": int(Z.shape[0]), "label_normal": LABEL_NORMAL,
                  "train_seconds": res.seconds},
    }
    save_json(manifest, art / "vae_clean_manifest.json")
    from shm_tpu.report import plot_loss_curves
    plot_loss_curves(res.history, paths.vae_dir / "plots", "vae_train_loss",
                     keys=(("train_total", "Train"),
                           ("train_subset_total", "Train subset (first 10%)")))
    print(f"[OK] VAE trained on {Z.shape[0]} normals ({res.seconds:.1f}s); "
          f"manifest + checkpoint under {art}")


def _load_openlab_vae(paths: Paths, cfg: OpenLabConfig):
    art = paths.vae_dir / "artifacts"
    manifest = load_json(art / "vae_clean_manifest.json")
    mc = manifest["model"]
    vcfg = replace(cfg.vae, input_dim=mc["input_dim"], latent_dim=mc["latent_dim"],
                   hidden_dim=mc["hidden_dim"], num_layers=mc["num_layers"],
                   dropout=mc["dropout"], cell=mc.get("cell", "lstm"))
    model = vae_from_config(vcfg)
    template = model.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((2, cfg.seq_len, mc["input_dim"])))
    params = load_params({"params": template["params"]},
                         art / "vae_exceedance_clean.msgpack")["params"]
    mu = np.load(art / "vae_clean_mean.npy").astype(np.float32)
    sd = np.load(art / "vae_clean_std.npy").astype(np.float32)
    return model, params, mu, sd, manifest


def cmd_validate_vae(paths: Paths, cfg: OpenLabConfig) -> None:
    Xc, _, meta = _load_extracted(paths)
    split = load_json(paths.extracted / "run_split.json")
    model, params, mu, sd, manifest = _load_openlab_vae(paths, cfg)
    ch_idx = list(map(int, manifest["channels_idx"]))

    val_runs = set(map(str, split["val_runs"]))
    vmask = meta["run_id"].astype(str).isin(val_runs).to_numpy()
    Xv = standardize_clip(Xc[vmask][:, :, ch_idx], mu, sd, cfg.standardize_clip)
    labels = meta.loc[vmask, "label"].astype(str).to_numpy()

    mse = reconstruction_mse(model, params, Xv, batch_size=2048)
    mseN = mse[labels == LABEL_NORMAL]
    mseE = mse[labels == LABEL_STRUCT_FAULT]
    mseSF = mse[labels == LABEL_SENSOR_FAULT]
    if mseN.size < 50:
        raise RuntimeError(f"Too few VAL normals: {mseN.size}")

    thr = percentile_threshold(mseN, cfg.threshold_percentile)
    result = {
        "threshold": thr,
        "threshold_source": f"P{cfg.threshold_percentile:g} of VAL normals",
        "percentile": cfg.threshold_percentile,
        "val_runs": sorted(val_runs),
        "n_val_windows": int(mse.size),
        "n_val_normal": int(mseN.size),
        "n_val_struct": int(mseE.size),
        "n_val_sensor": int(mseSF.size),
        "normal_fpr_at_threshold": float((mseN > thr).mean()),
        "struct_tpr_at_threshold": float((mseE > thr).mean()) if mseE.size else None,
        "sensor_rate_above_threshold": float((mseSF > thr).mean()) if mseSF.size else None,
    }
    art = ensure_dir(paths.vae_val_dir / "artifacts")
    save_json(result, art / "vae_threshold.json")
    from shm_tpu.report import plot_score_hist
    plot_score_hist({"Normal": mseN, "Structural Fault": mseE, "Sensor Fault": mseSF},
                    thr, paths.vae_val_dir / "plots", "vae_val_mse_histogram")
    print(f"[OK] threshold={thr:.6f} | normal FPR={result['normal_fpr_at_threshold']:.4f} "
          f"| struct TPR={result['struct_tpr_at_threshold']}")


# ---------------------------------------------------------------------------
# 06 train CNN / 07 validate CNN
# ---------------------------------------------------------------------------

def _sf_st_split_data(Xr, meta, split, split_name: str):
    runs = set(map(str, split[f"{split_name}_runs"]))
    m = meta["run_id"].astype(str).isin(runs).to_numpy()
    lab = meta["label"].astype(str).to_numpy()
    keep = m & np.isin(lab, [LABEL_SENSOR_FAULT, LABEL_STRUCT_FAULT])
    y = (lab[keep] == LABEL_STRUCT_FAULT).astype(np.int32)  # SF=0, ST=1
    return Xr[keep], y


def _tune_st_first(cfg: OpenLabConfig, p_st: np.ndarray, y: np.ndarray) -> Dict:
    """ST-first VAL threshold tuning with this stage's cfg-pinned grid and
    precision floor — the ONE policy shared by the CNN trainer/validator and
    every ML baseline (reference: Codes/06_train_cnn.py:239-324, duplicated
    at 07_validate_cnn.py:149-229 and 08_train_ml_baselines.py:145-230)."""
    return tune_threshold_st_first(
        p_st, y, p_min_st=cfg.st_precision_floor, beta_for_f2_st=2.0,
        grid_points=cfg.threshold_grid_points,
        grid_lo=cfg.threshold_grid_lo, grid_hi=cfg.threshold_grid_hi)


def cmd_train_cnn(paths: Paths, cfg: OpenLabConfig, epochs: Optional[int] = None,
                  quality: bool = False, n_seeds: int = 3,
                  devices: Optional[int] = None) -> None:
    """Train the SF-vs-ST CNN (Codes/06_train_cnn.py recipe).

    ``quality=True`` (beyond-reference, flag-gated): the per-epoch VAL ST-F2
    used for checkpoint selection is noisy (weak labels, 2 val runs, weighted
    resampling), so train ``n_seeds`` independent seeds with longer patience
    (40 vs 25) and keep the single model with the best tuned VAL ST-F2 —
    artifact layout unchanged. Default (off) reproduces the reference recipe.
    """
    _, Xr, meta = _load_extracted(paths)
    split = load_json(paths.extracted / "run_split.json")

    Xtr, ytr = _sf_st_split_data(Xr, meta, split, "train")
    Xva, yva = _sf_st_split_data(Xr, meta, split, "val")
    print(f"Train windows: {len(ytr)} (SF={(ytr == 0).sum()}, ST={(ytr == 1).sum()})")
    print(f"Val windows  : {len(yva)} (SF={(yva == 0).sum()}, ST={(yva == 1).sum()})")

    # PLAIN mean/std over RAW windows, exactly as the reference
    # (Codes/06_train_cnn.py:124-125) — NOT nan-aware, deliberately: raw
    # SF windows carry NaN, so a channel with any NaN gets NaN stats and
    # standardize_clip's nan_to_num then zeroes that channel everywhere
    # (train/val/test AND the hybrid). The committed bridge data does this
    # to LWA_4. Faithful parity, but loud about it:
    mu = Xtr.mean(axis=(0, 1)).astype(np.float32)
    sd = Xtr.std(axis=(0, 1)).astype(np.float32)
    sd = np.where(sd < 1e-8, 1.0, sd).astype(np.float32)
    dead = np.isnan(mu) | np.isnan(sd)
    if dead.any():
        print(f"[WARN] NaN raw-window stats zero out channel(s) "
              f"{np.where(dead)[0].tolist()} for CNN training AND serving "
              "(reference-faithful: 06_train_cnn.py:124-125 has the same "
              "behavior on NaN-bearing raw windows).")
    art = ensure_dir(paths.cnn_dir / "artifacts")
    save_npy(np.stack([mu, sd]), art / "cnn_raw_mu_sd.npy")

    Xtr_s = standardize_clip(Xtr, mu, sd, cfg.standardize_clip)[..., None]  # NHWC C=1
    Xva_s = standardize_clip(Xva, mu, sd, cfg.standardize_clip)[..., None]

    # inverse-frequency focal alpha, normalized to mean 1 (06:379-386)
    n_sf, n_st = max(1, int((ytr == 0).sum())), max(1, int((ytr == 1).sum()))
    alpha = np.array([1.0 / n_sf, 1.0 / n_st], np.float32)
    alpha = alpha / alpha.mean()
    weights = np.where(ytr == 0, alpha[0], alpha[1])

    def st_f2_metric(probs: np.ndarray, y_true: np.ndarray) -> float:
        return _tune_st_first(cfg, probs[:, 1], y_true)["f2_st"]

    tcfg = cfg.cnn_train if epochs is None else replace(cfg.cnn_train, epochs=epochs)
    tcfg = replace(tcfg, batch_size=128)  # 06_train_cnn.py:52
    model = CNNOpenLab(dropout=cfg.cnn.dropout)
    from shm_tpu.parallel import make_mesh_opt
    mesh = make_mesh_opt(devices)
    if mesh is not None:
        print(f"[INFO] data-parallel training over {mesh.devices.size} devices")
    if quality:
        tcfg = replace(tcfg, early_stop_patience=40)
        results = []
        for s in range(n_seeds):
            r = train_cnn(model, Xtr_s, ytr, Xva_s, yva,
                          replace(tcfg, seed=tcfg.seed + s), loss="focal",
                          focal_gamma=cfg.focal_gamma, class_alpha=alpha,
                          sample_weights=weights, val_metric_fn=st_f2_metric,
                          log_every=0, fused_epoch=False, mesh=mesh)
            print(f"[quality] seed {tcfg.seed + s}: ST-F2={r.best_metric:.4f} "
                  f"@ epoch {r.best_epoch} (stopped {r.stopped_epoch})")
            results.append(r)
        res = max(results, key=lambda r: r.best_metric)
        res.seconds = sum(r.seconds for r in results)
    else:
        # fused_epoch default (on for TPU): with the im2col convs the fused
        # per-epoch program compiles in seconds — lax.conv lowering used to
        # cost ~300s of remote compile inside a scan, which forced a
        # fused_epoch=False pin here (round-2 history in BENCHMARKS.md).
        res = train_cnn(model, Xtr_s, ytr, Xva_s, yva, tcfg, loss="focal",
                        focal_gamma=cfg.focal_gamma, class_alpha=alpha,
                        sample_weights=weights, val_metric_fn=st_f2_metric,
                        log_every=1, mesh=mesh)

    save_params(res.variables, art / "cnn_model_openlab.msgpack")
    probs = predict_probs(model, res.variables, Xva_s)
    tuned = _tune_st_first(cfg, probs[:, 1], yva)
    info = {
        "best_epoch": res.best_epoch, "stopped_epoch": res.stopped_epoch,
        "best_st_f2": res.best_metric, "val": tuned,
        "train_seconds": res.seconds,
        "settings": {"P_MIN_ST": cfg.st_precision_floor, "BETA_FOR_F2_ST": 2.0,
                     "CLIP_Z": cfg.standardize_clip,
                     "THRESH_GRID": cfg.threshold_grid_points,
                     "quality_mode": quality,
                     "n_seeds": n_seeds if quality else 1},
        "alpha": alpha.tolist(),
    }
    save_json(info, art / "cnn_training_info.json")
    from shm_tpu.report import plot_loss_curves
    plot_loss_curves(res.history, paths.cnn_dir / "plots", "cnn_train_val_loss",
                     keys=(("train_loss", "train"), ("val_loss", "val")))
    print(f"[OK] CNN best ST-F2={res.best_metric:.4f} @ epoch {res.best_epoch} "
          f"({res.seconds:.1f}s); tuned t={tuned['t']:.3f}")


def _load_openlab_cnn(paths: Paths, cfg: OpenLabConfig, conv_impl=None):
    from shm_tpu.models.cnn import inference_conv_impl

    art = paths.cnn_dir / "artifacts"
    # pure inference from saved artifacts: native lax.conv on TPU — its
    # inference graph compiles in ~4.5s where the im2col concats cost ~154s
    # at this batch size (round-3 probe; steady-state within 9%, max prob
    # diff 1.3e-3 bf16). Training keeps im2col (the ~115s lax TRAIN-step
    # compile is the cost im2col exists to avoid). conv_impl= overrides the
    # backend default (AOT export targeting the OTHER platform needs it).
    model = CNNOpenLab(dropout=cfg.cnn.dropout,
                       conv_impl=conv_impl or inference_conv_impl())
    template = model.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((2, cfg.seq_len, 4, 1)))
    variables = load_params(template, art / "cnn_model_openlab.msgpack")
    mu_sd = np.load(art / "cnn_raw_mu_sd.npy").astype(np.float32)
    return model, variables, mu_sd[0], mu_sd[1]


def cmd_validate_cnn(paths: Paths, cfg: OpenLabConfig, split_name: str = "val") -> None:
    _, Xr, meta = _load_extracted(paths)
    split = load_json(paths.extracted / "run_split.json")
    model, variables, mu, sd = _load_openlab_cnn(paths, cfg)
    art = ensure_dir(paths.cnn_val_dir / "artifacts")

    X, y = _sf_st_split_data(Xr, meta, split, split_name)
    Xs = standardize_clip(X, mu, sd, cfg.standardize_clip)[..., None]
    probs = predict_probs(model, variables, Xs)
    p_st = probs[:, 1]

    if split_name == "val":
        tuned = _tune_st_first(cfg, p_st, y)
        thr = tuned["t"]
        save_npy(np.array([thr], np.float32), art / "cnn_best_threshold.npy")
        extra = {"tuning": tuned}
    else:
        thr = float(np.load(art / "cnn_best_threshold.npy").ravel()[0])
        extra = {"frozen_threshold": thr}

    yhat = (p_st >= thr).astype(np.int64)
    report = classification_report_dict(y, yhat, ["Sensor Fault", "Structural Fault"])
    cm = confusion_matrix(y, yhat, 2)
    summary = {
        "split": split_name, "threshold": float(thr),
        "accuracy": accuracy(y, yhat),
        "st": binary_prf(y, yhat),
        "auroc_st": roc_auc_score(y, p_st) if len(np.unique(y)) == 2 else None,
        "confusion_matrix": cm.tolist(),
        "n": int(len(y)), **extra,
    }
    save_json(summary, art / f"cnn_{split_name}_summary.json")
    from shm_tpu.report import plot_cm_row_norm, plot_score_hist
    plot_cm_row_norm(cm, ["SF", "ST"], paths.cnn_val_dir / "plots",
                     f"cnn_{split_name}_cm")
    plot_score_hist({"SF": p_st[y == 0], "ST": p_st[y == 1]}, thr,
                    paths.cnn_val_dir / "plots", f"cnn_{split_name}_pst_hist",
                    xlabel="p(ST)")
    print(f"[OK] CNN {split_name}: acc={summary['accuracy']:.4f} "
          f"ST-F1={summary['st']['f1']:.4f} t={thr:.3f}")
    print(np.array(cm))


# ---------------------------------------------------------------------------
# 08 train ML / 09 validate ML
# ---------------------------------------------------------------------------

def _ml_data(paths: Paths):
    import pandas as pd

    X_feat = np.load(paths.features / "X_feat.npy").astype(np.float32)
    meta = pd.read_csv(paths.features / "meta_used.csv")
    split = load_json(paths.extracted / "run_split.json")
    lab = meta["label"].astype(str).to_numpy()
    keep = np.isin(lab, [LABEL_SENSOR_FAULT, LABEL_STRUCT_FAULT])
    y = (lab[keep] == LABEL_STRUCT_FAULT).astype(np.int64)
    X = X_feat[keep]
    run_ids = meta.loc[keep, "run_id"].astype(str).to_numpy()
    masks = {s: np.isin(run_ids, list(map(str, split[f"{s}_runs"])))
             for s in ("train", "val", "test")}
    return X, y, masks


def cmd_train_ml(paths: Paths, cfg: OpenLabConfig,
                 svm_probability: str = "calibrated") -> None:
    import joblib

    X, y, masks = _ml_data(paths)
    Xtr, ytr = X[masks["train"]], y[masks["train"]]
    Xva, yva = X[masks["val"]], y[masks["val"]]
    print(f"Train SF/ST: {len(ytr)} (SF={(ytr == 0).sum()}, ST={(ytr == 1).sum()})")
    if len(ytr) < 10 or len(np.unique(ytr)) < 2:
        raise RuntimeError("Training set too small or missing a class.")

    art = ensure_dir(paths.ml_dir / "artifacts")
    models = build_ml_models(cfg.seed, svm_probability=svm_probability)
    summary: List[Dict] = []
    for name, model in models.items():
        t0 = time.perf_counter()
        try:
            model.fit(Xtr, ytr)
            p_va = get_prob_st(model, Xva)
            tuned = _tune_st_first(cfg, p_va, yva)
            joblib.dump(model, art / f"{name}.joblib")
            save_npy(np.array([tuned["t"]], np.float32), art / f"{name}_threshold.npy")
            row = {"name": name, "status": "ok", "seconds": time.perf_counter() - t0,
                   **{k: tuned[k] for k in ("t", "prec_st", "rec_st", "f2_st",
                                            "macro_f1", "used_fallback")}}
            print(f"[OK] {name}: t={tuned['t']:.3f} recST={tuned['rec_st']:.3f} "
                  f"f2ST={tuned['f2_st']:.3f} ({row['seconds']:.1f}s)")
        except Exception as e:  # per-model failure tolerance (08:431-436)
            row = {"name": name, "status": "failed", "error": str(e)}
            print(f"[FAIL] {name}: {e}")
        summary.append(row)
    save_json({"models": summary, "seed": cfg.seed},
              paths.ml_dir / "artifacts" / "ml_training_info.json")
    import pandas as pd
    pd.DataFrame(summary).to_csv(art / "ml_val_summary.csv", index=False)
    save_json(summary, art / "ml_val_summary.json")


def cmd_validate_ml(paths: Paths, cfg: OpenLabConfig, split_name: str = "val") -> None:
    import joblib

    X, y, masks = _ml_data(paths)
    Xe, ye = X[masks[split_name]], y[masks[split_name]]
    art = paths.ml_dir / "artifacts"
    out = ensure_dir(paths.ml_dir / f"validation_{split_name}")
    results: Dict[str, Dict] = {}
    for mp in sorted(Path(art).glob("*.joblib")):
        name = mp.stem
        model = joblib.load(mp)
        p_st = get_prob_st(model, Xe)
        if split_name == "val":
            tuned = _tune_st_first(cfg, p_st, ye)
            thr = tuned["t"]
            save_npy(np.array([thr], np.float32), art / f"{name}_threshold.npy")
        else:
            thr = float(np.load(art / f"{name}_threshold.npy").ravel()[0])
        yhat = (p_st >= thr).astype(np.int64)
        cm = confusion_matrix(ye, yhat, 2)
        results[name] = {
            "threshold": float(thr),
            "accuracy": accuracy(ye, yhat),
            "st": binary_prf(ye, yhat),
            "auroc_st": roc_auc_score(ye, p_st) if len(np.unique(ye)) == 2 else None,
            "confusion_matrix": cm.tolist(),
        }
        from shm_tpu.report import plot_cm_row_norm, plot_score_hist
        plot_cm_row_norm(cm, ["SF", "ST"], out, f"{name}_cm")
        plot_score_hist({"SF": p_st[ye == 0], "ST": p_st[ye == 1]}, thr, out,
                        f"{name}_pst_hist", xlabel="p(ST)")
        print(f"[OK] {name} {split_name}: acc={results[name]['accuracy']:.4f} "
              f"ST-F1={results[name]['st']['f1']:.4f}")
    save_json(results, out / f"ml_{split_name}_summary.json")


# ---------------------------------------------------------------------------
# 10 hybrid comparison / 11 plots
# ---------------------------------------------------------------------------

STAGE2_MODELS: List[Tuple[str, Optional[str]]] = [
    ("cnn", None), ("ml", "cart"), ("ml", "rf"), ("ml", "gb"), ("ml", "hgb"),
    ("ml", "svm_rbf"),
]

# models whose inference runs on-device: trees via shm_tpu.models.forest_jax,
# svm_rbf via shm_tpu.models.svm_jax (exact libsvm Platt + coupling replica)
DEVICE_ML = {"cart", "rf", "gb", "hgb", "svm_rbf"}


def cmd_test_hybrid(paths: Paths, cfg: OpenLabConfig, split_name: str = "test",
                    host_ml: bool = False) -> None:
    import joblib

    Xc, Xr, meta = _load_extracted(paths)
    split = load_json(paths.extracted / "run_split.json")
    runs = set(map(str, split[f"{split_name}_runs"]))
    emask = meta["run_id"].astype(str).isin(runs).to_numpy()
    Xce, Xre = Xc[emask], Xr[emask]
    y_true = meta.loc[emask, "label"].astype(str).to_numpy()

    X_feat_all = np.load(paths.features / "X_feat.npy").astype(np.float32)
    if len(X_feat_all) != len(meta):
        # mirrors the reference's meta/tensor row-alignment hard-fail
        # (10_test_hybrid_pipeline.py:330-331): a featurize run with
        # drop_sensor_fault=True writes fewer rows than the extracted window
        # set (aligned to meta_used.csv, which only _ml_data honors) — index-
        # ing it with the full-meta mask would score the wrong feature rows.
        # Checked BEFORE the gate pass so the failure costs no device time.
        raise RuntimeError(
            f"features/X_feat.npy has {len(X_feat_all)} rows but the "
            f"extracted window set has {len(meta)}; it was probably written "
            "by `featurize` with drop_sensor_fault=True — the hybrid "
            "comparison scores every anomalous window, so re-run featurize "
            "without dropping sensor-fault windows")
    X_feat = X_feat_all[emask]

    # --- VAE gate on CLEAN channel-selected standardized windows ---
    model, params, mu, sd, manifest = _load_openlab_vae(paths, cfg)
    ch_idx = list(map(int, manifest["channels_idx"]))
    thr_obj = load_json(paths.vae_val_dir / "artifacts" / "vae_threshold.json")
    vae_thr = float(thr_obj["threshold"])
    Xg = standardize_clip(Xce[:, :, ch_idx], mu, sd, cfg.standardize_clip)
    t0 = time.perf_counter()
    mse = reconstruction_mse(model, params, Xg, batch_size=2048)
    anomaly_mask = mse > vae_thr
    gate_seconds = time.perf_counter() - t0
    print(f"[gate] anomaly_rate={anomaly_mask.mean():.4f} "
          f"({int(anomaly_mask.sum())}/{len(mse)}) in {gate_seconds:.2f}s")

    # --- Stage-2 inputs ---
    cnn_model, cnn_vars, cmu, csd = _load_openlab_cnn(paths, cfg)
    cnn_thr = float(np.load(paths.cnn_val_dir / "artifacts"
                            / "cnn_best_threshold.npy").ravel()[0])

    reports = ensure_dir(paths.hybrid_dir / "reports")
    cms: Dict[str, np.ndarray] = {}
    summary = {"split": split_name, "runs": sorted(runs), "vae_threshold": vae_thr,
               "anomaly_rate": float(anomaly_mask.mean()),
               "labels_order": LABELS_3, "models": []}
    bar_metrics: Dict[str, Dict[str, float]] = {}

    for mode, ml_name in STAGE2_MODELS:
        name = "CNN" if mode == "cnn" else ml_name.upper()
        y_pred = np.full(len(y_true), LABEL_NORMAL, dtype=object)
        prob_st = None
        if anomaly_mask.any():
            if mode == "cnn":
                Xa = standardize_clip(Xre[anomaly_mask], cmu, csd,
                                      cfg.standardize_clip)[..., None]
                prob_st = predict_probs(cnn_model, cnn_vars, Xa)[:, 1].astype(np.float64)
                thr2 = cnn_thr
            else:
                mp = paths.ml_dir / "artifacts" / f"{ml_name}.joblib"
                mdl = joblib.load(mp)
                Xa = X_feat[anomaly_mask]
                if ml_name in DEVICE_ML and not host_ml:
                    from shm_tpu.models.forest_jax import transform_features

                    Xd = transform_features(mdl, Xa)
                    if ml_name == "svm_rbf":
                        from sklearn.calibration import CalibratedClassifierCV
                        from sklearn.pipeline import Pipeline

                        from shm_tpu.models.svm_jax import (
                            calibrated_svm_predict_proba, export_calibrated_svm,
                            export_svm, svm_predict_proba,
                        )

                        clf = (mdl.steps[-1][1]
                               if isinstance(mdl, Pipeline) else mdl)
                        if isinstance(clf, CalibratedClassifierCV):
                            # sklearn>=1.11 training path
                            # (build_ml_models(svm_probability="calibrated"))
                            prob_st = np.asarray(calibrated_svm_predict_proba(
                                export_calibrated_svm(mdl), Xd), np.float64)
                        else:
                            prob_st = np.asarray(svm_predict_proba(
                                export_svm(mdl), Xd), np.float64)
                    else:
                        from shm_tpu.models.forest_jax import (
                            ensemble_predict_proba, export_ensemble,
                        )

                        prob_st = np.asarray(
                            ensemble_predict_proba(export_ensemble(mdl), Xd),
                            np.float64)
                else:
                    prob_st = get_prob_st(mdl, Xa)
                thr2 = float(np.load(paths.ml_dir / "artifacts"
                                     / f"{ml_name}_threshold.npy").ravel()[0])
            pred_bin = (prob_st >= thr2).astype(np.int64)
            y_pred[anomaly_mask] = np.where(pred_bin == 0, LABEL_SENSOR_FAULT,
                                            LABEL_STRUCT_FAULT)

        lbl_to_i = {l: i for i, l in enumerate(LABELS_3)}
        cm3 = confusion_matrix([lbl_to_i[v] for v in y_true],
                               [lbl_to_i[v] for v in y_pred], 3)
        cms[f"VAE + {name}"] = cm3

        # stage-2 metrics on routed anomalies with GT in {SF, ST} (10:425-453)
        met = {k: None for k in ("accuracy", "precision_ST", "recall_ST",
                                 "f1_ST", "auroc_ST")}
        if anomaly_mask.any() and prob_st is not None:
            yt_a = y_true[anomaly_mask]
            keep = np.isin(yt_a, [LABEL_SENSOR_FAULT, LABEL_STRUCT_FAULT])
            if keep.any():
                yb = (yt_a[keep] == LABEL_STRUCT_FAULT).astype(int)
                pb = (np.asarray(y_pred)[anomaly_mask][keep] == LABEL_STRUCT_FAULT).astype(int)
                prf = binary_prf(yb, pb)
                met = {
                    "accuracy": accuracy(yb, pb),
                    "precision_ST": prf["precision"],
                    "recall_ST": prf["recall"],
                    "f1_ST": prf["f1"],
                    "auroc_ST": (roc_auc_score(yb, prob_st[keep])
                                 if len(np.unique(yb)) == 2 else None),
                }
        summary["models"].append({
            "name": name,
            "stage2_metrics_on_routed_anomalies": met,
            "confusion_matrix_counts_3class": cm3.tolist(),
        })
        bar_metrics[name] = {k.replace("_ST", ""): (v if v is not None else 0.0)
                             for k, v in met.items()}
        print(f"[{name}] 3-class acc={accuracy([lbl_to_i[v] for v in y_true], [lbl_to_i[v] for v in y_pred]):.4f} "
              f"stage2={met}")

    save_json(summary, reports / "comparison_summary.json")
    np.save(reports / "stage2_metrics.npy",
            np.array([bar_metrics], dtype=object), allow_pickle=True)
    # keep CM grid inputs for the plots command
    np.savez(reports / "cm3_all.npz", **{k: v for k, v in cms.items()})
    print(f"[OK] wrote {reports / 'comparison_summary.json'}")


def cmd_plots(paths: Paths, cfg: OpenLabConfig) -> None:
    reports = paths.hybrid_dir / "reports"
    summary = load_json(reports / "comparison_summary.json")
    cms_npz = np.load(reports / "cm3_all.npz")
    cms = {k: cms_npz[k] for k in cms_npz.files}
    from shm_tpu.report import plot_cm_grid, plot_metrics_bar
    out = paths.hybrid_dir / "plots"
    plot_cm_grid(cms, ["Normal", "SF", "ST"], out, "hybrid_cm_grid")
    metrics = {m["name"]: {
        "Accuracy": m["stage2_metrics_on_routed_anomalies"]["accuracy"] or 0.0,
        "Precision": m["stage2_metrics_on_routed_anomalies"]["precision_ST"] or 0.0,
        "Recall": m["stage2_metrics_on_routed_anomalies"]["recall_ST"] or 0.0,
        "F1": m["stage2_metrics_on_routed_anomalies"]["f1_ST"] or 0.0,
        "AUROC": m["stage2_metrics_on_routed_anomalies"]["auroc_ST"] or 0.0,
    } for m in summary["models"]}
    plot_metrics_bar(metrics, out, "hybrid_stage2_metrics_bar",
                     ["Accuracy", "Precision", "Recall", "F1", "AUROC"])
    print(f"[OK] wrote hybrid plots under {out}")


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="shm_tpu.cli.openlab", description=__doc__)
    ap.add_argument("command", choices=[
        "extract", "make-splits", "featurize", "train-vae", "validate-vae",
        "train-cnn", "validate-cnn", "train-ml", "validate-ml", "test-hybrid",
        "plots", "all"])
    ap.add_argument("--root", default="data/openlab")
    ap.add_argument("--raw-dir", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--split", default=None, choices=[None, "val", "test"])
    ap.add_argument("--host-ml", action="store_true",
                    help="force sklearn host inference for tree models in "
                         "test-hybrid (default: on-device)")
    ap.add_argument("--quality", action="store_true",
                    help="train-cnn: beyond-reference quality mode (multi-seed"
                         " + longer patience, best VAL ST-F2 model kept)")
    ap.add_argument("--seeds", type=int, default=3,
                    help="number of seeds for --quality (default 3)")
    ap.add_argument("--svm-probability", default="calibrated",
                    choices=["svc", "calibrated"],
                    help="train-ml SVM probability path: 'calibrated' "
                         "(default) = CalibratedClassifierCV(SVC(), "
                         "ensemble=False), the sklearn-1.11 replacement for "
                         "the deprecated probability param; 'svc' = the "
                         "reference's exact SVC(probability=True) (parity "
                         "flag; FutureWarning on sklearn>=1.9); both serve "
                         "on-device in test-hybrid")
    ap.add_argument("--devices", type=int, default=None,
                    help="data-parallel training over the first N local devices")
    ap.add_argument("--cell", choices=["lstm", "min_gru", "attention"],
                    default="lstm",
                    help="VAE temporal-stack family for train-vae (recorded "
                         "in the manifest; downstream commands auto-detect "
                         "it). min_gru (parallel-scan cell) and attention "
                         "(transformer stack) are opt-in — NOT the "
                         "reference-parity model, and on THIS stage's real "
                         "bridge data the min_gru gate measured weaker "
                         "(struct TPR 0.773 vs 0.858 at matched FPR; "
                         "BENCHMARKS.md) — validate before deploying")
    args = ap.parse_args(argv)

    raw_dir = args.raw_dir or default_openlab_raw_dir()
    cfg = OpenLabConfig()
    if args.cell != "lstm":
        cfg = replace(cfg, vae=replace(cfg.vae, cell=args.cell))
    paths = Paths(args.root, raw_dir)

    steps = {
        "extract": lambda: cmd_extract(paths, cfg),
        "make-splits": lambda: cmd_make_splits(paths, cfg),
        "featurize": lambda: cmd_featurize(paths, cfg),
        "train-vae": lambda: cmd_train_vae(paths, cfg, args.epochs,
                                           devices=args.devices),
        "validate-vae": lambda: cmd_validate_vae(paths, cfg),
        "train-cnn": lambda: cmd_train_cnn(paths, cfg, args.epochs,
                                           quality=args.quality,
                                           n_seeds=args.seeds,
                                           devices=args.devices),
        "validate-cnn": lambda: cmd_validate_cnn(paths, cfg, args.split or "val"),
        "train-ml": lambda: cmd_train_ml(paths, cfg,
                                         args.svm_probability),
        "validate-ml": lambda: cmd_validate_ml(paths, cfg, args.split or "val"),
        "test-hybrid": lambda: cmd_test_hybrid(paths, cfg, args.split or "test",
                                               host_ml=args.host_ml),
        "plots": lambda: cmd_plots(paths, cfg),
    }
    if args.command == "all":
        order = ["extract", "make-splits", "featurize", "train-vae", "validate-vae",
                 "train-cnn", "validate-cnn", "train-ml", "validate-ml",
                 "test-hybrid", "plots"]
        for name in order:
            print(f"\n===== {name} =====")
            steps[name]()
    else:
        steps[args.command]()


if __name__ == "__main__":
    main()
