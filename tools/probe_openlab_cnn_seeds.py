"""Probe: 3-seed study of the openLAB hybrid CNN AUROC-ST cell (VERDICT r4 #8).

The one quality cell below the reference is the hybrid CNN's AUROC-ST on
routed TEST anomalies: 0.9908 (committed, seed 42) vs the reference code's
measured 0.9925 (BENCHMARKS.md hybrid table). This probe answers whether
0.9925 is inside the seed band: retrain the openLAB CNN with the EXACT
committed recipe (Codes/06_train_cnn.py parity path of cli/openlab.py::
cmd_train_cnn, quality=False) at seeds 42/43/44, keep the gate fixed (the
committed VAE + threshold), and compute each seed's AUROC-ST on the same
routed anomaly set. AUROC is threshold-free, so the CNN threshold tuning
step does not enter the cell.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_openlab_cnn_seeds.py
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    sys.path.insert(0, ".")
    from shm_tpu.cli.openlab import (
        LABEL_SENSOR_FAULT, LABEL_STRUCT_FAULT, Paths, _load_extracted,
        _load_openlab_vae, _sf_st_split_data, standardize_clip,
    )
    from shm_tpu.config import OpenLabConfig, replace
    from shm_tpu.evals import roc_auc_score
    from shm_tpu.models import CNNOpenLab
    from shm_tpu.train import reconstruction_mse, train_cnn
    from shm_tpu.train.cnn import predict_probs
    from shm_tpu.utils.io import load_json

    cfg = OpenLabConfig()
    paths = Paths("data/openlab", cfg.raw_dir)
    Xc, Xr, meta = _load_extracted(paths)
    split = load_json(paths.extracted / "run_split.json")

    # ---- fixed gate: committed VAE + threshold on the TEST split ----
    runs = set(map(str, split["test_runs"]))
    emask = meta["run_id"].astype(str).isin(runs).to_numpy()
    Xce, Xre = Xc[emask], Xr[emask]
    y_true = meta.loc[emask, "label"].astype(str).to_numpy()
    model_v, params_v, mu, sd, manifest = _load_openlab_vae(paths, cfg)
    ch_idx = list(map(int, manifest["channels_idx"]))
    vae_thr = float(load_json(paths.vae_val_dir / "artifacts"
                              / "vae_threshold.json")["threshold"])
    Xg = standardize_clip(Xce[:, :, ch_idx], mu, sd, cfg.standardize_clip)
    mse = reconstruction_mse(model_v, params_v, Xg, batch_size=2048)
    anomaly_mask = np.asarray(mse) > vae_thr
    yt_a = y_true[anomaly_mask]
    keep = np.isin(yt_a, [LABEL_SENSOR_FAULT, LABEL_STRUCT_FAULT])
    yb = (yt_a[keep] == LABEL_STRUCT_FAULT).astype(int)
    print(f"gate: anomaly rate {anomaly_mask.mean():.4f}; routed SF/ST "
          f"windows {int(keep.sum())} (ST={int(yb.sum())})", flush=True)

    # ---- CNN training data, exactly cmd_train_cnn's recipe ----
    Xtr, ytr = _sf_st_split_data(Xr, meta, split, "train")
    Xva, yva = _sf_st_split_data(Xr, meta, split, "val")
    cmu = Xtr.mean(axis=(0, 1)).astype(np.float32)
    csd = Xtr.std(axis=(0, 1)).astype(np.float32)
    csd = np.where(csd < 1e-8, 1.0, csd).astype(np.float32)
    Xtr_s = standardize_clip(Xtr, cmu, csd, cfg.standardize_clip)[..., None]
    Xva_s = standardize_clip(Xva, cmu, csd, cfg.standardize_clip)[..., None]
    n_sf, n_st = max(1, int((ytr == 0).sum())), max(1, int((ytr == 1).sum()))
    alpha = np.array([1.0 / n_sf, 1.0 / n_st], np.float32)
    alpha = alpha / alpha.mean()
    weights = np.where(ytr == 0, alpha[0], alpha[1])

    from shm_tpu.cli.openlab import _tune_st_first

    def st_f2_metric(probs, y):      # cmd_train_cnn's val selection metric
        return _tune_st_first(cfg, probs[:, 1], y)["f2_st"]

    tcfg = replace(cfg.cnn_train, batch_size=128)
    model = CNNOpenLab(dropout=cfg.cnn.dropout)
    Xa = standardize_clip(Xre[anomaly_mask], cmu, csd,
                          cfg.standardize_clip)[..., None]

    aurocs = []
    for s in (42, 43, 44):
        res = train_cnn(model, Xtr_s, ytr, Xva_s, yva,
                        replace(tcfg, seed=s), loss="focal",
                        focal_gamma=cfg.focal_gamma, class_alpha=alpha,
                        sample_weights=weights, val_metric_fn=st_f2_metric,
                        log_every=0)
        prob_st = predict_probs(model, res.variables, Xa)[:, 1].astype(
            np.float64)
        auroc = roc_auc_score(yb, prob_st[keep])
        aurocs.append(auroc)
        print(f"seed {s}: best ST-F2 {res.best_metric:.4f} @ ep "
              f"{res.best_epoch} (stopped {res.stopped_epoch}, "
              f"{res.seconds:.1f}s) -> hybrid AUROC-ST {auroc:.4f}", flush=True)

    lo, hi = min(aurocs), max(aurocs)
    print(f"\nseed band: [{lo:.4f}, {hi:.4f}] mean "
          f"{np.mean(aurocs):.4f}; committed cell 0.9908; reference 0.9925 "
          f"{'INSIDE' if lo <= 0.9925 <= hi else 'OUTSIDE'} the band")


if __name__ == "__main__":
    main()
