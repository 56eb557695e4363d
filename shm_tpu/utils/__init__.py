from shm_tpu.utils.io import (
    ensure_dir,
    save_json,
    load_json,
    save_npy,
    load_npy,
    save_csv,
    load_csv,
)
from shm_tpu.utils.checkpoint import save_params, load_params

__all__ = [
    "ensure_dir",
    "save_json",
    "load_json",
    "save_npy",
    "load_npy",
    "save_csv",
    "load_csv",
    "save_params",
    "load_params",
]
