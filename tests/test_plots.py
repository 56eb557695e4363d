"""Smoke tests: every plotting helper triple-saves pdf/png/svg."""

import numpy as np
import pytest

from shm_tpu.report import (
    plot_loss_curves, plot_stacked_channels, plot_reconstruction_overlay,
    plot_cm_row_norm, plot_roc, plot_pr_curve, plot_score_hist,
    plot_latent_pca, plot_cm_grid, plot_metrics_bar,
)


def _check(tmp_path, stem):
    for ext in ("pdf", "png", "svg"):
        f = tmp_path / f"{stem}.{ext}"
        assert f.exists() and f.stat().st_size > 0, f"missing {f}"


def test_all_plots_triple_save(tmp_path, rng):
    t = np.linspace(0, 10, 200)
    plot_loss_curves({"epoch": [1, 2, 3], "train_total": [3, 2, 1],
                      "val_total": [3.2, 2.1, 1.4]}, tmp_path, "loss")
    _check(tmp_path, "loss")

    plot_stacked_channels(t, {"x1": np.sin(t), "x2": np.cos(t)}, tmp_path, "stack")
    _check(tmp_path, "stack")

    plot_reconstruction_overlay(t, {"x": np.sin(t)}, {"x": np.sin(t) * 0.9},
                                tmp_path, "overlay")
    _check(tmp_path, "overlay")

    cm = np.array([[50, 2, 1], [3, 40, 2], [0, 1, 30]])
    plot_cm_row_norm(cm, ["N", "SF", "ST"], tmp_path, "cm")
    _check(tmp_path, "cm")

    fpr = np.linspace(0, 1, 50)
    plot_roc({"gate": (fpr, np.sqrt(fpr), 0.9)}, tmp_path, "roc")
    _check(tmp_path, "roc")

    plot_pr_curve(np.linspace(1, 0.5, 50), np.linspace(0, 1, 50), 0.8,
                  tmp_path, "pr", "hybrid")
    _check(tmp_path, "pr")

    plot_score_hist({"Normal": rng.random(100), "Fault": rng.random(100) + 1},
                    1.0, tmp_path, "hist")
    plot_score_hist({"Normal": rng.random(100) + 0.1}, None, tmp_path,
                    "hist_logx", log_x=True)
    _check(tmp_path, "hist")
    _check(tmp_path, "hist_logx")

    mu = rng.normal(size=(120, 5))
    plot_latent_pca(mu, rng.integers(0, 4, 120), ["a", "b", "c", "d"],
                    tmp_path, "pca")
    _check(tmp_path, "pca")

    plot_cm_grid({"VAE + CNN": cm, "VAE + RF": cm}, ["N", "SF", "ST"],
                 tmp_path, "grid")
    _check(tmp_path, "grid")

    plot_metrics_bar({"CNN": {"F1": 0.9, "AUROC": 0.95},
                      "RF": {"F1": 0.85, "AUROC": 0.9}}, tmp_path, "bars",
                     ["F1", "AUROC"])
    _check(tmp_path, "bars")
