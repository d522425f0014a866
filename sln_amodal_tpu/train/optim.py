"""Optimizer + layer-freezing stages.

Reference semantics (``/root/reference/model.py:304-358``): SGD momentum 0.9,
weight decay 1e-4 on non-BN params, gradient clip 5.0, and staged layer
freezing selected by name regexes ("heads", "4+", "all", ...).

Two departures, both documented:

- batch norm is always frozen (as in the reference) — FrozenBatchNorm params
  never receive updates;
- the reference's ``set_trainable`` only ever *disables* gradients and never
  re-enables them, so its 3-stage schedule silently trains the heads in all
  three stages (backbone stages stay frozen once stage 1 froze them). Here
  each stage's trainable set is computed fresh from the stage spec —
  the *intended* schedule. Set ``sticky_freeze=True`` on
  :class:`StageSchedule` to reproduce the reference's effective behavior.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

import jax
import jax.numpy as jnp
import optax

# Trainable-path predicates per stage, over '/'-joined param paths of the
# SLNAmodal tree (fpn/..., rpn/..., classifier/..., mask/..., glm/...).
# The GLM module is always frozen (reference: frozen DeepLab, model.py:537).


def _is_frozen_bn(path: str) -> bool:
    return "frozen_bn" in path


def _is_glm(path: str) -> bool:
    return path.startswith("glm/")


def _heads(path: str) -> bool:
    return (
        path.startswith("rpn/")
        or path.startswith("classifier/")
        or path.startswith("mask/")
        or (path.startswith("fpn/p") and ("lateral" in path or "smooth" in path))
    )


STAGES: Dict[str, Callable[[str], bool]] = {
    "heads": _heads,
    "5+": lambda p: _heads(p) or p.startswith("fpn/layer5"),
    "4+": lambda p: _heads(p) or p.startswith("fpn/layer4") or p.startswith("fpn/layer5"),
    "3+": lambda p: _heads(p)
    or p.startswith("fpn/layer3")
    or p.startswith("fpn/layer4")
    or p.startswith("fpn/layer5"),
    "all": lambda p: True,
    "mask": lambda p: p.startswith("mask/"),
}


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        name = getattr(k, "key", None)
        parts.append(str(name if name is not None else k))
    return "/".join(parts)


def trainable_mask(params: Any, stage) -> Any:
    """Boolean pytree: True where the stage trains the param.

    ``stage`` may be a stage name, a path predicate, or an already-computed
    boolean pytree (returned unchanged)."""
    if not isinstance(stage, str) and not callable(stage):
        return stage  # precomputed mask tree
    pred = STAGES[stage] if isinstance(stage, str) else stage
    inner = params["params"] if isinstance(params, dict) and "params" in params else params

    def leaf_mask(key_path, _leaf):
        p = _path_str(key_path)
        if _is_frozen_bn(p) or _is_glm(p):
            return False
        return bool(pred(p))

    masked = jax.tree_util.tree_map_with_path(leaf_mask, inner)
    if isinstance(params, dict) and "params" in params:
        return {"params": masked}
    return masked


def weight_decay_mask(params: Any) -> Any:
    """wd applies to non-BN params only (reference model.py:352-356)."""
    inner = params["params"] if isinstance(params, dict) and "params" in params else params

    def leaf_mask(key_path, _leaf):
        p = _path_str(key_path)
        return not _is_frozen_bn(p) and not _is_glm(p)

    masked = jax.tree_util.tree_map_with_path(leaf_mask, inner)
    if isinstance(params, dict) and "params" in params:
        return {"params": masked}
    return masked


def _zero_frozen(mask_tree: Any) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree_util.tree_map(
            lambda g, m: g if m else jnp.zeros_like(g), updates, mask_tree
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    params: Any,
    stage: str,
    learning_rate: float,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    clip_norm: float = 5.0,
) -> optax.GradientTransformation:
    """clip(5.0) → +wd·θ (non-BN) → momentum → -lr, with frozen grads zeroed
    (exactly the reference's step: clip_grad_norm then torch SGD with
    wd-in-step, model.py:440-443)."""
    t_mask = trainable_mask(params, stage)
    wd_mask = jax.tree_util.tree_map(
        lambda t, w: t and w, t_mask, weight_decay_mask(params)
    )
    return optax.chain(
        _zero_frozen(t_mask),
        optax.clip_by_global_norm(clip_norm),
        optax.add_decayed_weights(weight_decay, mask=wd_mask),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale(-learning_rate),
    )


class StageSchedule:
    """The reference's 3-stage schedule (amodal_train.py:642-663):
    heads ×2 epochs → 4+ ×3 epochs → all ×1 epoch @ lr/10.

    sticky_freeze=True reproduces the reference's effective behavior (each
    stage can only shrink the trainable set)."""

    def __init__(self, learning_rate: float, sticky_freeze: bool = False):
        self.stages: List[tuple] = [
            ("heads", learning_rate, 2),
            ("4+", learning_rate, 3),
            ("all", learning_rate / 10.0, 1),
        ]
        self.sticky_freeze = sticky_freeze

    def stage_mask(self, params: Any, stage_idx: int) -> Any:
        name = self.stages[stage_idx][0]
        mask = trainable_mask(params, name)
        if self.sticky_freeze:
            for prev in range(stage_idx):
                prev_mask = trainable_mask(params, self.stages[prev][0])
                mask = jax.tree_util.tree_map(lambda a, b: a and b, mask, prev_mask)
        return mask
