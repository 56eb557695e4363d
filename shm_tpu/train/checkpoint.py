"""Mid-training checkpoint/resume.

The reference can only checkpoint final/best weights and cannot resume a run
(SURVEY.md §5 "Checkpoint / resume": ``torch.save(state_dict)`` at end, no
mid-training resume anywhere). Here every trainer can periodically persist its
FULL training state — params, optimizer state, best-so-far selection, PRNG key,
history — and continue exactly where it stopped.

One msgpack file (flax serialization) holds the array pytrees; a sidecar JSON
holds the scalars/history so a human can inspect progress without deserializing.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from shm_tpu.utils.io import ensure_dir


def save_train_ckpt(path: str | Path, arrays: Any, meta: Dict) -> None:
    """Persist (arrays pytree, JSON-serializable meta) atomically."""
    p = Path(path)
    ensure_dir(p.parent)
    tmp = p.with_suffix(p.suffix + ".tmp")
    tmp.write_bytes(serialization.to_bytes(arrays))
    tmp.replace(p)
    meta_p = p.with_suffix(".meta.json")
    tmp_m = meta_p.with_suffix(".tmp")
    tmp_m.write_text(json.dumps(meta, indent=2), encoding="utf-8")
    tmp_m.replace(meta_p)


def load_train_ckpt(path: str | Path, template: Any) -> Optional[Tuple[Any, Dict]]:
    """Restore into ``template``'s structure; None if no checkpoint exists."""
    p = Path(path)
    meta_p = p.with_suffix(".meta.json")
    if not p.exists() or not meta_p.exists():
        return None
    arrays = serialization.from_bytes(template, p.read_bytes())
    meta = json.loads(meta_p.read_text(encoding="utf-8"))
    return arrays, meta


__all__ = ["save_train_ckpt", "load_train_ckpt"]
