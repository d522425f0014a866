"""Checkpoint save / restore / find-last.

Covers the reference's per-epoch ``torch.save`` + ``find_last`` + partial
``load_weights`` (``/root/reference/model.py:252-302``): flax-serialized
param trees at ``{log_dir}/{name}/sln_amodal_{name}_{epoch:04d}.ckpt``,
``find_last`` scanning for the newest, and torch ``.pth`` files loaded
transparently through the converter.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import flax.serialization

CKPT_RE = re.compile(r"sln_amodal_(\w+)_(\d{4})\.ckpt$")


def checkpoint_path(log_dir: str, name: str, epoch: int) -> str:
    return os.path.join(log_dir, name.lower(), f"sln_amodal_{name.lower()}_{epoch:04d}.ckpt")


def save(variables: Any, log_dir: str, name: str, epoch: int) -> str:
    path = checkpoint_path(log_dir, name, epoch)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))
    return path


def restore(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def find_last(log_dir: str, name: str) -> Tuple[Optional[str], Optional[int]]:
    """Newest checkpoint path + its epoch, or (None, None)."""
    d = os.path.join(log_dir, name.lower())
    if not os.path.isdir(d):
        return None, None
    best, best_epoch = None, -1
    for fn in os.listdir(d):
        m = CKPT_RE.search(fn)
        if m and int(m.group(2)) > best_epoch:
            best_epoch = int(m.group(2))
            best = os.path.join(d, fn)
    return best, (best_epoch if best else None)


def save_train_state(state: Any, log_dir: str, name: str, epoch: int) -> str:
    """Full resume checkpoint: params + optimizer state + step."""
    path = checkpoint_path(log_dir, name, epoch) + ".state"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    return path


def restore_train_state(path: str, template_state: Any) -> Any:
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template_state, f.read())


def load_weights(path: str, template: Any, glm_path: Optional[str] = None) -> Any:
    """Load a checkpoint: native .ckpt, or a reference torch .pth (converted
    on the fly — the reference's strict=False partial-load role)."""
    if path.endswith(".pth"):
        from ..convert.torch_weights import load_reference_checkpoint

        return load_reference_checkpoint(path, glm_path, template=template)
    return restore(path, template)
