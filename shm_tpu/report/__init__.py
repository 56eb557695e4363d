from shm_tpu.report.plots import (
    configure_axis,
    save_figure,
    plot_loss_curves,
    plot_stacked_channels,
    plot_reconstruction_overlay,
    plot_cm_row_norm,
    plot_roc,
    plot_pr_curve,
    plot_score_hist,
    plot_latent_pca,
    plot_cm_grid,
    plot_metrics_bar,
)

__all__ = [
    "configure_axis",
    "save_figure",
    "plot_loss_curves",
    "plot_stacked_channels",
    "plot_reconstruction_overlay",
    "plot_cm_row_norm",
    "plot_roc",
    "plot_pr_curve",
    "plot_score_hist",
    "plot_latent_pca",
    "plot_cm_grid",
    "plot_metrics_bar",
]
