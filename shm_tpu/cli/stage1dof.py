"""Stage 1 (1_DOF) pipeline CLI — fundamental TVAE validation.

Mirrors ``1_DOF/Scripts/01..06`` with compatible artifacts:

    python -m shm_tpu.cli.stage1dof gen-seen      # 01_generate_seen_variants
    python -m shm_tpu.cli.stage1dof gen-unseen    # 02_generate_unseen_variants
    python -m shm_tpu.cli.stage1dof train-vae     # 03_train_vae
    python -m shm_tpu.cli.stage1dof test-seen     # 04_test_seen_variants
    python -m shm_tpu.cli.stage1dof test-unseen   # 05_test_unseen_variants
    python -m shm_tpu.cli.stage1dof compare-rmse  # 06_compare_seen_vs_unseen_rmse
    python -m shm_tpu.cli.stage1dof all

Artifacts under ``--root`` (default ./data/1dof): ``raw/1dof_seen_variants.csv``,
``raw/1dof_unseen_variants.csv``, ``processed/{split.json,vae_mean,vae_std}``,
``models/temporal_vae.msgpack``, ``tables/reconstruction_{seen,unseen}/
{reconstruction_series,segment_rmse}.csv``, ``figures/...``.

TPU-native differences: the oscillator integrates as one ``lax.scan``; the test
path runs every window through the VAE in one device call and stitches with a
scatter-add; the reference's per-window Python loops disappear.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Dict

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from shm_tpu.config import Stage1DofConfig, replace
from shm_tpu.data import (
    make_windows, compute_standardizer, standardize, destandardize,
    stitch_windows, segment_rmse,
)
from shm_tpu.models import vae_from_config
from shm_tpu.sim import simulate_free_vibration_sdof, make_clean_variants, make_unseen_variants
from shm_tpu.sim.signals import SEEN_COLUMNS, UNSEEN_COLUMNS, variants_to_matrix
from shm_tpu.train import train_vae
from shm_tpu.utils.io import ensure_dir, load_json, save_json, save_npy, load_npy
from shm_tpu.utils.checkpoint import save_params, load_params

VARIANT_NAMES_SEEN = ["Original", "Drifted", "Upscaled Amplitude", "Low-Frequency"]
VARIANT_NAMES_UNSEEN = ["Sinusoid", "Envelope", "Triangle", "Square"]
# variant k uses channels [k, 4+k, 8+k] (x/v/a interleaved by variant)
VARIANT_COLS = [[0, 4, 8], [1, 5, 9], [2, 6, 10], [3, 7, 11]]


class Paths:
    def __init__(self, root: str):
        self.root = Path(root)
        self.raw = self.root / "raw"
        self.processed = self.root / "processed"
        self.models = self.root / "models"
        self.figures = self.root / "figures"
        self.tables = self.root / "tables"


def build_variant_window_labels(windows: np.ndarray) -> np.ndarray:
    """Energy-argmax variant label per window (1_DOF/03_train_vae.py:84-114)."""
    if windows.shape[2] < 12:
        raise ValueError(f"Expected >= 12 channels, got {windows.shape[2]}")
    E = np.stack([(windows[:, :, c] ** 2).sum(axis=(1, 2)) for c in VARIANT_COLS],
                 axis=1)
    return np.argmax(E, axis=1).astype(np.int64)


# ---------------------------------------------------------------------------
# generation (01, 02)
# ---------------------------------------------------------------------------

def cmd_gen_seen(paths: Paths, cfg: Stage1DofConfig, plot: bool = True) -> None:
    t, x, v, a = simulate_free_vibration_sdof(cfg.sdof)
    var = make_clean_variants(t, x, v, a, cfg.drift_rate, cfg.amp_scale,
                              cfg.lowfreq_factor)
    M = np.asarray(variants_to_matrix(var, SEEN_COLUMNS))
    df = pd.DataFrame({"time": np.asarray(t)})
    for i, c in enumerate(SEEN_COLUMNS):
        df[c] = M[:, i]
    ensure_dir(paths.raw)
    df.to_csv(paths.raw / "1dof_seen_variants.csv", index=False)
    print(f"[OK] wrote raw/1dof_seen_variants.csv ({len(df)} rows, 12 channels)")
    if plot:
        from shm_tpu.report import plot_stacked_channels
        for qty in ("x", "v", "a"):
            chans = {c: np.asarray(var[c]) for c in SEEN_COLUMNS if c.startswith(qty)}
            plot_stacked_channels(np.asarray(t), chans, paths.figures / "variants",
                                  f"seen_variants_{qty}_stacked")


def cmd_gen_unseen(paths: Paths, cfg: Stage1DofConfig, plot: bool = True) -> None:
    t = jnp.arange(0.0, cfg.sdof.t_total + cfg.sdof.dt, cfg.sdof.dt)
    var = make_unseen_variants(t, cfg.unseen_amplitude, cfg.unseen_base_freq_hz)
    M = np.asarray(variants_to_matrix(var, UNSEEN_COLUMNS))
    df = pd.DataFrame({"time": np.asarray(t)})
    for i, c in enumerate(UNSEEN_COLUMNS):
        df[c] = M[:, i]
    ensure_dir(paths.raw)
    df.to_csv(paths.raw / "1dof_unseen_variants.csv", index=False)
    print(f"[OK] wrote raw/1dof_unseen_variants.csv ({len(df)} rows, 12 channels)")
    if plot:
        from shm_tpu.report import plot_stacked_channels
        for qty in ("x", "v", "a"):
            chans = {c: np.asarray(var[c]) for c in UNSEEN_COLUMNS if c.startswith(qty)}
            plot_stacked_channels(np.asarray(t), chans, paths.figures / "variants",
                                  f"unseen_variants_{qty}_stacked")


# ---------------------------------------------------------------------------
# training (03)
# ---------------------------------------------------------------------------

def cmd_train_vae(paths: Paths, cfg: Stage1DofConfig, epochs: int | None = None,
                  plot: bool = True, devices: int | None = None) -> None:
    df = pd.read_csv(paths.raw / "1dof_seen_variants.csv")
    data = df.drop(columns=["time"]).to_numpy().astype(np.float32)
    T = data.shape[0]
    split = int(cfg.train_frac * T)
    train_data = data[:split]
    save_json({"T": int(T), "split_index": int(split),
               "train_frac": float(cfg.train_frac),
               "cell": cfg.vae.cell}, paths.processed / "split.json")

    mean, std = compute_standardizer(jnp.asarray(train_data))
    save_npy(np.asarray(mean), paths.processed / "vae_mean.npy")
    save_npy(np.asarray(std), paths.processed / "vae_std.npy")

    Z = np.asarray(standardize(jnp.asarray(train_data), mean, std))
    W = np.asarray(make_windows(jnp.asarray(Z), cfg.seq_len, cfg.stride))
    print(f"[INFO] train windows: {W.shape}")

    tcfg = cfg.train if epochs is None else replace(cfg.train, epochs=epochs)
    model = vae_from_config(cfg.vae)
    # the reference trains without a val split and keeps the FINAL model
    # (1_DOF/03_train_vae.py:330-333) — use a small val slice for the history
    # but save last_params for parity. The fused-epochs TPU default is
    # measured for THIS shape too (tools/probe_1dof_fused.py): 28s compile
    # + 14.5s/100 epochs vs 44.7s loop — fused wins even one-shot.
    from shm_tpu.parallel import make_mesh_opt
    mesh = make_mesh_opt(devices)
    if mesh is not None:
        print(f"[INFO] data-parallel training over {mesh.devices.size} devices")
    res = train_vae(model, W, W[: max(len(W) // 10, 1)], tcfg, log_every=10,
                    mesh=mesh)
    save_params({"params": res.last_params}, paths.models / "temporal_vae.msgpack")

    hist = pd.DataFrame({
        "epoch": res.history["epoch"],
        "loss_total": res.history["train_total"],
        "loss_recon": res.history["train_recon"],
        "loss_kl": res.history["train_kl"],
        "kl_weight": res.history["kl_w"],
    })
    ensure_dir(paths.tables / "training")
    hist.to_csv(paths.tables / "training" / "training_losses.csv", index=False)
    print(f"[OK] saved model + training_losses.csv ({res.seconds:.1f}s)")

    if plot:
        from shm_tpu.report import plot_loss_curves, plot_latent_pca
        plot_loss_curves(res.history, paths.figures / "training", "training_curves",
                         keys=(("train_total", "Total"), ("train_recon", "Reconstruction"),
                               ("train_kl", "KL")))
        mu = _encode_mu(model, res.last_params, W)
        labels = build_variant_window_labels(W)
        plot_latent_pca(mu, labels, VARIANT_NAMES_SEEN, paths.figures / "training",
                        "latent_pca_by_variant")


def _encode_mu(model, params, W: np.ndarray, batch: int = 2048) -> np.ndarray:
    mus = []
    for i in range(0, len(W), batch):
        _, mu, _ = model.apply({"params": params}, jnp.asarray(W[i:i + batch]))
        mus.append(np.asarray(mu))
    return np.concatenate(mus)


def _load_model(paths: Paths, cfg: Stage1DofConfig):
    # the trainer records the recurrence family in split.json; a mismatched
    # cell cannot restore (the param trees differ), so detect it here and the
    # eval commands work without re-passing --cell
    split_meta = paths.processed / "split.json"
    vcfg = cfg.vae
    if split_meta.exists():
        cell = load_json(split_meta).get("cell", "lstm")
        if cell != vcfg.cell:
            vcfg = replace(vcfg, cell=cell)
    model = vae_from_config(vcfg)
    template = model.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((2, cfg.seq_len, cfg.vae.input_dim)))
    restored = load_params({"params": template["params"]},
                           paths.models / "temporal_vae.msgpack")
    return model, restored["params"]


# ---------------------------------------------------------------------------
# evaluation (04, 05)
# ---------------------------------------------------------------------------

def _eval_series(paths: Paths, cfg: Stage1DofConfig, csv_name: str, tag: str,
                 use_split: bool, label_names, plot: bool) -> None:
    """Shared eval: windows -> recon -> stitch -> destandardize -> segment RMSE.

    ``use_split=True`` evaluates the second-half test split (04_test_seen:269-274);
    False evaluates the whole series (05_test_unseen).
    """
    df = pd.read_csv(paths.raw / csv_name)
    time_s = df["time"].to_numpy()
    data = df.drop(columns=["time"]).to_numpy().astype(np.float32)
    cols = df.columns[1:].tolist()

    if use_split:
        start = int(cfg.train_frac * data.shape[0])
        time_s, data = time_s[start:], data[start:]

    mean = jnp.asarray(load_npy(paths.processed / "vae_mean.npy"))
    std = jnp.asarray(load_npy(paths.processed / "vae_std.npy"))
    Z = standardize(jnp.asarray(data), mean, std)
    W = make_windows(Z, cfg.seq_len, cfg.stride)

    model, params = _load_model(paths, cfg)
    recon, mu, _ = model.apply({"params": params}, W)   # one device call
    recon_norm = stitch_windows(recon, Z.shape[0], cfg.stride)
    recon_series = np.asarray(destandardize(recon_norm, mean, std))

    out_tab = ensure_dir(paths.tables / f"reconstruction_{tag}")
    rec_df = pd.DataFrame({"time": time_s})
    for j, c in enumerate(cols):
        rec_df[c] = data[:, j]
        rec_df[c + "_recon"] = recon_series[:, j]
    rec_df.to_csv(out_tab / "reconstruction_series.csv", index=False)

    rmses = np.asarray(segment_rmse(jnp.asarray(data), jnp.asarray(recon_series),
                                    cfg.segment_len))
    pd.DataFrame({"segment_index": np.arange(len(rmses)), "rmse": rmses}).to_csv(
        out_tab / "segment_rmse.csv", index=False)
    print(f"[OK] {tag}: {W.shape[0]} windows, {len(rmses)} segments, "
          f"mean RMSE {rmses.mean():.6f}")

    if plot:
        from shm_tpu.report import (
            plot_reconstruction_overlay, plot_latent_pca, save_figure, configure_axis,
        )
        import matplotlib.pyplot as plt

        out_fig = paths.figures / f"reconstruction_{tag}"
        x_cols = [c for c in cols if c.startswith("x_")]
        plot_reconstruction_overlay(
            time_s, {c: np.asarray(rec_df[c]) for c in x_cols},
            {c: np.asarray(rec_df[c + "_recon"]) for c in x_cols},
            out_fig, "x_measured_vs_reconstructed_stacked")
        fig, ax = plt.subplots(figsize=(12, 8))
        ax.plot(np.arange(len(rmses)), rmses, linewidth=1.5)
        configure_axis(ax, "Segment index", "RMSE")
        fig.tight_layout()
        save_figure(fig, out_fig, "segment_rmse_curve")
        plt.close(fig)
        labels = build_variant_window_labels(np.asarray(W))
        plot_latent_pca(np.asarray(mu), labels, label_names, out_fig,
                        "latent_pca_by_type")


def cmd_test_seen(paths: Paths, cfg: Stage1DofConfig, plot: bool = True) -> None:
    _eval_series(paths, cfg, "1dof_seen_variants.csv", "seen", True,
                 VARIANT_NAMES_SEEN, plot)


def cmd_test_unseen(paths: Paths, cfg: Stage1DofConfig, plot: bool = True) -> None:
    _eval_series(paths, cfg, "1dof_unseen_variants.csv", "unseen", False,
                 VARIANT_NAMES_UNSEEN, plot)


# ---------------------------------------------------------------------------
# comparison (06)
# ---------------------------------------------------------------------------

def cmd_compare_rmse(paths: Paths, cfg: Stage1DofConfig, plot: bool = True) -> None:
    seen = pd.read_csv(paths.tables / "reconstruction_seen" / "segment_rmse.csv")
    unseen = pd.read_csv(paths.tables / "reconstruction_unseen" / "segment_rmse.csv")
    out_dir = ensure_dir(paths.figures / "rmse_comparison")

    summary = pd.DataFrame({
        "Set": ["Seen", "Unseen"],
        "Mean": [seen["rmse"].mean(), unseen["rmse"].mean()],
        "Median": [seen["rmse"].median(), unseen["rmse"].median()],
        "Std": [seen["rmse"].std(ddof=1), unseen["rmse"].std(ddof=1)],
        "Min": [seen["rmse"].min(), unseen["rmse"].min()],
        "Max": [seen["rmse"].max(), unseen["rmse"].max()],
    })
    summary.to_csv(out_dir / "rmse_summary_stats.csv", index=False)
    print(summary.to_string(index=False))

    if plot:
        import matplotlib.pyplot as plt
        from shm_tpu.report import save_figure, configure_axis

        fig, ax = plt.subplots(figsize=(12, 8))
        ax.plot(seen["segment_index"], seen["rmse"], linewidth=1.5, label="Seen")
        ax.plot(unseen["segment_index"], unseen["rmse"], linewidth=1.5,
                linestyle="--", label="Unseen")
        configure_axis(ax, "Segment index", "RMSE")
        ax.legend(frameon=False, fontsize=14)
        fig.tight_layout()
        save_figure(fig, out_dir, "rmse_line_seen_vs_unseen")
        plt.close(fig)

        fig, ax = plt.subplots(figsize=(10, 8))
        ax.boxplot([seen["rmse"], unseen["rmse"]], tick_labels=["Seen", "Unseen"],
                   patch_artist=True, showfliers=False, widths=0.55)
        configure_axis(ax, "", "RMSE")
        fig.tight_layout()
        save_figure(fig, out_dir, "rmse_boxplot_seen_vs_unseen")
        plt.close(fig)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="shm_tpu.cli.stage1dof", description=__doc__)
    ap.add_argument("command", choices=["gen-seen", "gen-unseen", "train-vae",
                                        "test-seen", "test-unseen", "compare-rmse",
                                        "all"])
    ap.add_argument("--root", default="data/1dof")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--no-plots", action="store_true")
    ap.add_argument("--devices", type=int, default=None,
                    help="data-parallel training over the first N local devices")
    ap.add_argument("--cell", choices=["lstm", "min_gru", "attention"],
                    default="lstm",
                    help="VAE temporal-stack family for train-vae (recorded "
                         "in split.json; the eval commands auto-detect it). "
                         "min_gru (parallel-scan cell) and attention "
                         "(transformer stack) are opt-in — NOT the "
                         "reference-parity model; see BENCHMARKS.md")
    args = ap.parse_args(argv)

    cfg = Stage1DofConfig()
    if args.cell != "lstm":
        cfg = replace(cfg, vae=replace(cfg.vae, cell=args.cell))
    paths = Paths(args.root)
    plot = not args.no_plots

    steps = {
        "gen-seen": lambda: cmd_gen_seen(paths, cfg, plot),
        "gen-unseen": lambda: cmd_gen_unseen(paths, cfg, plot),
        "train-vae": lambda: cmd_train_vae(paths, cfg, args.epochs, plot,
                                           devices=args.devices),
        "test-seen": lambda: cmd_test_seen(paths, cfg, plot),
        "test-unseen": lambda: cmd_test_unseen(paths, cfg, plot),
        "compare-rmse": lambda: cmd_compare_rmse(paths, cfg, plot),
    }
    if args.command == "all":
        for name in ("gen-seen", "gen-unseen", "train-vae", "test-seen",
                     "test-unseen", "compare-rmse"):
            print(f"\n===== {name} =====")
            steps[name]()
    else:
        steps[args.command]()


if __name__ == "__main__":
    main()
