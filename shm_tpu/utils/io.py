"""JSON/NPY/CSV artifact IO.

Parity target: ``20250506_openLAB_tests/Codes/io_utils.py:15-116`` (ensure_dir +
save/load json/npy/csv, utf-8 json, no-pickle npy). Artifact filenames and schemas
throughout the framework stay compatible with the reference so outputs are
comparable (e.g. ``vae_threshold.json``, ``normal_stats.npz``, ``run_splits.json``).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

import numpy as np


def ensure_dir(path: str | Path) -> Path:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    return p


def save_json(obj: Any, path: str | Path, indent: int = 2) -> None:
    p = Path(path)
    ensure_dir(p.parent)
    with p.open("w", encoding="utf-8") as f:
        json.dump(obj, f, indent=indent)


def load_json(path: str | Path) -> Any:
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"Missing: {p}")
    with p.open("r", encoding="utf-8") as f:
        return json.load(f)


def save_npy(arr, path: str | Path) -> None:
    p = Path(path)
    ensure_dir(p.parent)
    np.save(p, np.asarray(arr), allow_pickle=False)


def load_npy(path: str | Path) -> np.ndarray:
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"Missing: {p}")
    return np.load(p, allow_pickle=False)


def save_csv(df, path: str | Path, index: bool = False) -> None:
    p = Path(path)
    ensure_dir(p.parent)
    df.to_csv(p, index=index)


def load_csv(path: str | Path):
    import pandas as pd

    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"Missing: {p}")
    return pd.read_csv(p)


def load_csv_numeric(path: str | Path, num_features: int | None = None) -> np.ndarray:
    """Numeric CSV loader with shape guard (4DOF/Scripts/03_train_vae.py:81-87).

    Parses with pandas' C engine (~10x np.loadtxt — the reference's parser;
    host CSV parsing dominated CLI wall time otherwise) and falls back to
    np.loadtxt if pandas is unavailable.
    """
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"Missing CSV: {p}")
    try:
        import pandas as pd

        X = pd.read_csv(p, dtype=np.float32).to_numpy()
    except ImportError:
        X = np.loadtxt(str(p), delimiter=",", skiprows=1).astype(np.float32)
    if X.ndim != 2 or (num_features is not None and X.shape[1] != num_features):
        raise ValueError(f"Bad CSV shape in {p}: {X.shape}")
    if not np.isfinite(X).all():
        # pandas silently parses 'NA'/'NaN'/empty cells as NaN where
        # np.loadtxt (the reference's parser) raised; run CSVs are simulator
        # output and must be all-finite, so keep the loud failure.
        raise ValueError(f"Non-finite values in {p}")
    return X


__all__ = [
    "ensure_dir",
    "save_json",
    "load_json",
    "save_npy",
    "load_npy",
    "save_csv",
    "load_csv",
    "load_csv_numeric",
]
