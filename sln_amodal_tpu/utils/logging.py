"""Logging / observability helpers.

Superset of the reference's ad-hoc prints (``modal/Functions.py:17-48``,
``modal/networks.py:80-85``): structured step logging, array stats, progress
bar, and parameter counting over flax pytrees.
"""

from __future__ import annotations

import sys
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


def log(text: str, array: Optional[np.ndarray] = None) -> None:
    """Print a message, optionally with array shape/min/max stats."""
    if array is not None:
        array = np.asarray(array)
        text = text.ljust(25)
        if array.size:
            text += "shape: {:20}  min: {:10.5f}  max: {:10.5f}".format(
                str(array.shape), float(array.min()), float(array.max())
            )
        else:
            text += f"shape: {array.shape}  (empty)"
    print(text)


def progress_bar(iteration: int, total: int, prefix: str = "", suffix: str = "",
                 length: int = 50, fill: str = "|") -> None:
    """Terminal progress bar."""
    frac = iteration / float(max(total, 1))
    filled = int(length * iteration // max(total, 1))
    bar = fill * filled + "-" * (length - filled)
    sys.stdout.write(f"\r{prefix} |{bar}| {100 * frac:.1f}% {suffix}")
    if iteration >= total:
        sys.stdout.write("\n")
    sys.stdout.flush()


def count_params(params: Any) -> int:
    """Total parameter count of a flax pytree (reference print_network)."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def print_network(params: Any, name: str = "model") -> int:
    n = count_params(params)
    print(f"{name}: total number of parameters: {n}")
    return n


class StepTimer:
    """Simple step-time tracker for training/eval loops (the observability
    the reference's dead SummaryWriter never provided)."""

    def __init__(self):
        self.t0 = time.time()
        self.history: list[float] = []

    def tick(self) -> float:
        now = time.time()
        dt = now - self.t0
        self.t0 = now
        self.history.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.history:
            return {}
        arr = np.asarray(self.history)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
        }
