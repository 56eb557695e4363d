"""Single-file checkpointing of flax variable collections + JSON manifests.

The reference checkpoints are single ``torch.save(state_dict)`` files with
companion JSON manifests (e.g. 4DOF/Scripts/03_train_vae.py:328-331, 335-354;
Codes/04_train_vae.py:285-325). Here a checkpoint is one msgpack file (flax
serialization) holding the full variable pytree (params + batch_stats), plus the
same style of JSON manifest written by the callers.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
from flax import serialization

from shm_tpu.utils.io import ensure_dir


def save_params(variables: Any, path: str | Path) -> None:
    p = Path(path)
    ensure_dir(p.parent)
    data = serialization.to_bytes(variables)
    p.write_bytes(data)


def load_params(template: Any, path: str | Path) -> Any:
    """Restore into the structure of ``template`` (e.g. ``model.init(...)`` output)."""
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"Missing checkpoint: {p}")
    restored = serialization.from_bytes(template, p.read_bytes())
    return jax.tree.map(lambda x: x, restored)


__all__ = ["save_params", "load_params"]
