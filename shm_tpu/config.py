"""Typed, frozen configuration for the three SHM stages.

The reference spreads configuration across module-level ``CONFIG`` constant blocks
(e.g. ``4DOF/Scripts/03_train_vae.py:26-48``) and one real config module
(``20250506_openLAB_tests/Codes/config.py``). Here every stage gets a frozen
dataclass whose defaults reproduce those constants exactly, so any experiment is a
single immutable value that can be hashed into jit static arguments.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Tuple


# ---------------------------------------------------------------------------
# Model hyperparameters
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VAEConfig:
    """LSTM temporal-VAE hyperparameters.

    Presets mirror the three reference variants:
    - 1-DOF:   ``1_DOF/Scripts/Models/temporal_vae.py:7-64`` (no LayerNorm)
    - 4-DOF:   ``4DOF/Scripts/Models/temporal_vae.py:8-82`` (LayerNorm on h_last)
    - openLAB: ``Codes/Models/temporal_vae_model.py`` instantiated at
      ``Codes/04_train_vae.py`` with input 3, latent 8, hidden 64, 1 layer.
    """

    input_dim: int = 12
    latent_dim: int = 16
    hidden_dim: int = 128
    num_layers: int = 2
    dropout: float = 0.3
    use_layernorm: bool = True
    # temporal-stack family: "lstm" (reference parity, default), "min_gru"
    # (opt-in parallel-scan cell, shm_tpu.models.minrnn) or "attention"
    # (opt-in recurrence-free transformer stack, shm_tpu.models.attention) —
    # the non-lstm families are NOT parity models
    cell: str = "lstm"


@dataclass(frozen=True)
class CNNConfig:
    """CNN classifier hyperparameters (see shm_tpu.models.cnn for topologies)."""

    variant: str = "4dof"  # "4dof" (BN/ReLU 2-block) or "openlab" (GN/SiLU 4-block)
    input_channels: int = 2
    num_classes: int = 2
    dropout: float = 0.5
    seq_len: int = 100
    num_features: int = 12


@dataclass(frozen=True)
class TrainConfig:
    """Shared optimizer/loop settings."""

    seed: int = 42
    epochs: int = 50
    batch_size: int = 256
    lr: float = 1e-3
    weight_decay: float = 1e-5
    grad_clip: float = 2.0
    kl_warmup_ratio: float = 0.30
    early_stop_patience: int = 0  # 0 disables early stopping
    decoupled_wd: bool = False    # False = torch Adam L2 coupling; True = AdamW


# ---------------------------------------------------------------------------
# Stage 1 — 1_DOF
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SDOFParams:
    """Single-DOF oscillator (reference: 1_DOF/Scripts/signals_1dof.py:13-21)."""

    m: float = 100.0
    k: float = 1000.0
    c: float = 0.0
    x0: float = 0.01
    v0: float = 0.0
    t_total: float = 30.0
    dt: float = 0.01


@dataclass(frozen=True)
class Stage1DofConfig:
    sdof: SDOFParams = field(default_factory=SDOFParams)
    # variant generation (signals_1dof.py:67-128)
    drift_rate: float = 0.001
    amp_scale: float = 1.5
    lowfreq_factor: float = 0.6
    # unseen variants (signals_1dof.py:141-189)
    unseen_amplitude: float = 0.01
    unseen_base_freq_hz: float = 0.33
    # windowing / split (1_DOF/Scripts/03_train_vae.py)
    seq_len: int = 80
    stride: int = 1
    train_frac: float = 0.5
    segment_len: int = 100
    vae: VAEConfig = field(
        default_factory=lambda: VAEConfig(
            input_dim=12, latent_dim=5, hidden_dim=32, num_layers=2,
            dropout=0.2, use_layernorm=False,
        )
    )
    train: TrainConfig = field(
        default_factory=lambda: TrainConfig(
            epochs=100, batch_size=64, lr=1e-3, weight_decay=0.0,
            grad_clip=0.0, kl_warmup_ratio=0.30,
        )
    )


# ---------------------------------------------------------------------------
# Stage 2 — 4DOF
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SystemConfig:
    """N-DOF chain system (reference: 4DOF/Scripts/utils/simulation_4dof.py:13-23).

    Defaults reproduce ``default_system_config()`` (:140-152).
    """

    mass: Tuple[float, ...] = (60.0, 50.0, 50.0, 40.0)
    stiffness: Tuple[float, ...] = (300000.0, 240000.0, 200000.0, 160000.0)
    damping_ratio: float = 0.02
    beta: float = 0.25
    gamma: float = 0.5
    num_dofs: int = 4
    dt: float = 0.01
    t_total: float = 10.0

    @property
    def steps(self) -> int:
        return int(self.t_total / self.dt) + 1


@dataclass(frozen=True)
class FaultGenConfig:
    """Fault dataset generation (4DOF/Scripts/02_generate_fault_datasets.py)."""

    force_rms: float = 200.0
    force_seed: int = 42
    # structural: stiffness scale factors (:153 — 10/20/30/40 % reduction)
    stiffness_scales: Tuple[float, ...] = (0.9, 0.8, 0.7, 0.6)
    # sensor faults: (name, kind, dof, rel_magnitude) (:185-191)
    noise_rel_mag: float = 0.50     # on DOF 4
    spikes_rel_mag: float = 5.00    # on DOF 1, 1% of samples
    spikes_freq: float = 0.01
    drift_rel_mag: float = 10.0     # on DOF 2
    bias_rel_mag: float = 2.00      # on DOF 3


@dataclass(frozen=True)
class Stage4DofConfig:
    system: SystemConfig = field(default_factory=SystemConfig)
    faults: FaultGenConfig = field(default_factory=FaultGenConfig)
    # normal runs (01_generate_normal_runs.py)
    n_normal_runs: int = 10
    base_seed: int = 2025
    normal_force_rms: float = 50.0
    jitter_lo: float = 0.98
    jitter_hi: float = 1.02
    zeta_lo: float = 0.015
    zeta_hi: float = 0.025
    # windowing (cnn_model.py SEQ_LEN/NUM_FEATURES are source of truth)
    seq_len: int = 100
    num_features: int = 12
    stride: int = 1
    # time-fraction splits applied per run BEFORE windowing (03_train_vae.py:33-34)
    train_frac: Tuple[float, float] = (0.0, 0.4)
    val_frac: Tuple[float, float] = (0.4, 0.7)
    test_frac: Tuple[float, float] = (0.7, 1.0)
    # gate threshold percentile (04_vae_thresholding.py:283)
    threshold_percentile: float = 99.0
    vae: VAEConfig = field(
        default_factory=lambda: VAEConfig(
            input_dim=12, latent_dim=16, hidden_dim=128, num_layers=2,
            dropout=0.3, use_layernorm=True,
        )
    )
    vae_train: TrainConfig = field(
        default_factory=lambda: TrainConfig(
            epochs=50, batch_size=256, lr=1e-3, weight_decay=1e-5,
            grad_clip=2.0, kl_warmup_ratio=0.30,
        )
    )
    cnn: CNNConfig = field(
        default_factory=lambda: CNNConfig(
            variant="4dof", input_channels=2, num_classes=2, dropout=0.5,
            seq_len=100, num_features=12,
        )
    )
    # CNN training (05_train_cnn.py): Adam lr=1e-4 wd=5e-5, batch 100, <=50 epochs,
    # early stop patience 15
    cnn_train: TrainConfig = field(
        default_factory=lambda: TrainConfig(
            epochs=50, batch_size=100, lr=1e-4, weight_decay=5e-5,
            grad_clip=0.0, early_stop_patience=15,
        )
    )


# ---------------------------------------------------------------------------
# Stage 3 — openLAB
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class OpenLabConfig:
    """Real-bridge stage configuration (reference: Codes/config.py:14-101)."""

    # where the raw MD_*.txt catman exports live; resolved lazily
    raw_dir: str = ""
    out_dir: str = ""
    # windowing
    seq_len: int = 200
    stride: int = 20
    # structural-fault threshold (mm)
    allow_min: float = -1e9
    allow_max: float = 20.0
    # cleaning thresholds
    obstruction_sentinel: float = -1e5
    clean_max_jump_mm: float = 1.0
    clean_max_abs_mm: float = 65.0
    moving_avg_window: int = 5
    # sensor-fault rules (RAW integrity)
    raw_diff_th_mm: float = 1.0
    raw_abs_th_mm: float = 65.0
    raw_invalid_ratio_fault: float = 0.05
    flat_var_eps: float = 1e-6
    force_range_for_flatline: float = 5.0
    # splits
    seed: int = 42
    train_frac: float = 0.40
    val_frac: float = 0.30
    test_frac: float = 0.30
    # VAE (Codes/04_train_vae.py: input 3 = LWA_2/3/4, latent 8, hidden 64, 1 layer)
    vae: VAEConfig = field(
        default_factory=lambda: VAEConfig(
            input_dim=3, latent_dim=8, hidden_dim=64, num_layers=1,
            dropout=0.2, use_layernorm=True,
        )
    )
    vae_train: TrainConfig = field(
        default_factory=lambda: TrainConfig(
            epochs=100, batch_size=64, lr=5e-4, weight_decay=0.0,
            grad_clip=2.0, kl_warmup_ratio=0.30,
        )
    )
    # standardization clip (04_train_vae.py:106-117)
    standardize_clip: float = 10.0
    # VAE threshold = P95 of VAL-normal MSE (05_validate_vae.py:37)
    threshold_percentile: float = 95.0
    # CNN (Codes/Models/cnn_model.py): input (B,1,200,4)
    cnn: CNNConfig = field(
        default_factory=lambda: CNNConfig(
            variant="openlab", input_channels=1, num_classes=2, dropout=0.4,
            seq_len=200, num_features=4,
        )
    )
    # CNN training (06_train_cnn.py): AdamW 3e-4 wd 1e-4, <=100 epochs, patience 25
    cnn_train: TrainConfig = field(
        default_factory=lambda: TrainConfig(
            epochs=100, batch_size=64, lr=3e-4, weight_decay=1e-4,
            grad_clip=2.0, early_stop_patience=25, decoupled_wd=True,
        )
    )
    # focal loss gamma (06_train_cnn.py:195-207)
    focal_gamma: float = 2.0
    # ST-first threshold tuning (06_train_cnn.py:239-324)
    st_precision_floor: float = 0.25
    threshold_grid_points: int = 99
    threshold_grid_lo: float = 0.01
    threshold_grid_hi: float = 0.99


def default_openlab_raw_dir() -> str:
    """Locate the raw catman exports; override with SHM_TPU_OPENLAB_RAW."""
    env = os.environ.get("SHM_TPU_OPENLAB_RAW")
    if env:
        return env
    candidate = "/root/reference/20250506_openLAB_tests/Data/raw"
    if os.path.isdir(candidate):
        return candidate
    return ""


def replace(cfg, **kw):
    """dataclasses.replace passthrough for ergonomic config overrides."""
    return dataclasses.replace(cfg, **kw)


__all__ = [
    "VAEConfig",
    "CNNConfig",
    "TrainConfig",
    "SDOFParams",
    "Stage1DofConfig",
    "SystemConfig",
    "FaultGenConfig",
    "Stage4DofConfig",
    "OpenLabConfig",
    "default_openlab_raw_dir",
    "replace",
]
