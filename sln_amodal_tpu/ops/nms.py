"""Greedy non-maximum suppression as a static-shape XLA program.

Reproduces the exact semantics of the reference's custom kernel
(``/root/reference/nms/src/cuda/nms_kernel.cu:17-83`` via
``nms/pth_nms.py``): boxes arrive **pre-sorted by score descending**
(the proposal layer sorts first — Functions.py:145-149), greedy suppression
walks them in order, IoU uses the legacy ``+1`` pixel convention, and a box
is suppressed when ``iou > threshold`` (the GPU path; the CPU path's ``>=``
is available via ``suppress_at_equal=True``).

Everything is fixed-shape: ``max_outputs`` slots are always produced, padded
with ``pad_value`` when fewer boxes survive, so the op jits once and feeds a
static downstream pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .boxes import box_iou, box_iou_plus_one


@functools.partial(
    jax.jit,
    static_argnames=("max_outputs", "plus_one", "suppress_at_equal", "pad_value"),
)
def nms_sorted(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    max_outputs: int,
    iou_threshold: float,
    plus_one: bool = True,
    suppress_at_equal: bool = False,
    pad_value: int = -1,
):
    """Greedy NMS over score-sorted boxes.

    Args:
        boxes: [N, 4] (y1, x1, y2, x2), sorted by descending score.
        valid: [N] bool, False rows are padding and never selected.
        max_outputs: number of keep slots (static).
        iou_threshold: suppression threshold.
        plus_one: use the legacy +1 pixel IoU convention (reference default).
        suppress_at_equal: suppress at ``iou >= t`` instead of ``> t``.
        pad_value: index used for empty keep slots.

    Returns:
        keep: [max_outputs] int32 indices into ``boxes`` (padded).
        keep_valid: [max_outputs] bool.
    """
    n = boxes.shape[0]
    iou_fn = box_iou_plus_one if plus_one else box_iou
    boxes = boxes.astype(jnp.float32)

    def body(i, state):
        alive, keep, keep_valid = state
        has = jnp.any(alive)
        idx = jnp.argmax(alive)  # first alive (lowest index = highest score)
        iou = iou_fn(boxes[idx][None, :], boxes)[0]
        if suppress_at_equal:
            sup = iou >= iou_threshold
        else:
            sup = iou > iou_threshold
        new_alive = alive & jnp.logical_not(sup)
        new_alive = new_alive.at[idx].set(False)
        alive = jnp.where(has, new_alive, alive)
        keep = keep.at[i].set(jnp.where(has, idx, pad_value).astype(jnp.int32))
        keep_valid = keep_valid.at[i].set(has)
        return alive, keep, keep_valid

    alive0 = valid.astype(bool)
    keep0 = jnp.full((max_outputs,), pad_value, dtype=jnp.int32)
    kv0 = jnp.zeros((max_outputs,), dtype=bool)
    _, keep, keep_valid = jax.lax.fori_loop(0, max_outputs, body, (alive0, keep0, kv0))
    return keep, keep_valid


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_outputs: int,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
    **kw,
):
    """Sort boxes by score then run :func:`nms_sorted`.

    Returns (keep indices into the *original* array, keep_valid).
    """
    order = jnp.argsort(-scores)
    sorted_boxes = boxes[order]
    sorted_valid = (
        jnp.ones(boxes.shape[0], bool) if valid is None else valid[order]
    )
    keep, keep_valid = nms_sorted(
        sorted_boxes, sorted_valid, max_outputs, iou_threshold, **kw
    )
    keep = jnp.where(keep_valid, order[jnp.maximum(keep, 0)], keep)
    return keep.astype(jnp.int32), keep_valid
