"""Box geometry primitives (pure jnp, static shapes).

Covers the semantics of the reference box utilities:
``apply_box_deltas`` / ``clip_boxes`` (/root/reference/modal/Functions.py:77-111),
``bbox_overlaps`` (:184-218), ``box_refinement`` (/root/reference/utils.py:96-117).
Boxes are ``(y1, x1, y2, x2)`` rows throughout.
"""

from __future__ import annotations

import jax.numpy as jnp


LOG_DELTA_CLIP = 10.0  # guards exp overflow → inf-inf NaN boxes; real
                       # checkpoints produce |log-delta| << this.


def apply_box_deltas(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Apply (dy, dx, log dh, log dw) refinements to boxes. [..., 4] each
    (any number of leading batch dims)."""
    height = boxes[..., 2] - boxes[..., 0]
    width = boxes[..., 3] - boxes[..., 1]
    center_y = boxes[..., 0] + 0.5 * height + deltas[..., 0] * height
    center_x = boxes[..., 1] + 0.5 * width + deltas[..., 1] * width
    height = height * jnp.exp(jnp.clip(deltas[..., 2], -LOG_DELTA_CLIP, LOG_DELTA_CLIP))
    width = width * jnp.exp(jnp.clip(deltas[..., 3], -LOG_DELTA_CLIP, LOG_DELTA_CLIP))
    y1 = center_y - 0.5 * height
    x1 = center_x - 0.5 * width
    return jnp.stack([y1, x1, y1 + height, x1 + width], axis=-1)


def clip_boxes(boxes: jnp.ndarray, window) -> jnp.ndarray:
    """Clip boxes [..., 4] to window (y1, x1, y2, x2)."""
    wy1, wx1, wy2, wx2 = window
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], wy1, wy2),
            jnp.clip(boxes[..., 1], wx1, wx2),
            jnp.clip(boxes[..., 2], wy1, wy2),
            jnp.clip(boxes[..., 3], wx1, wx2),
        ],
        axis=-1,
    )


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix [N1, N2] (continuous-coordinate convention)."""
    b1 = boxes1[:, None, :]
    b2 = boxes2[None, :, :]
    y1 = jnp.maximum(b1[..., 0], b2[..., 0])
    x1 = jnp.maximum(b1[..., 1], b2[..., 1])
    y2 = jnp.minimum(b1[..., 2], b2[..., 2])
    x2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    area1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    area2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    union = area1 + area2 - inter
    return inter / jnp.where(union > 0, union, 1.0)


def box_iou_plus_one(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU with the legacy +1 pixel convention used by the
    reference NMS kernels (nms_kernel.cu:17-24, nms.c:51-58)."""
    b1 = boxes1[:, None, :]
    b2 = boxes2[None, :, :]
    y1 = jnp.maximum(b1[..., 0], b2[..., 0])
    x1 = jnp.maximum(b1[..., 1], b2[..., 1])
    y2 = jnp.minimum(b1[..., 2], b2[..., 2])
    x2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.maximum(x2 - x1 + 1.0, 0.0) * jnp.maximum(y2 - y1 + 1.0, 0.0)
    area1 = (b1[..., 2] - b1[..., 0] + 1.0) * (b1[..., 3] - b1[..., 1] + 1.0)
    area2 = (b2[..., 2] - b2[..., 0] + 1.0) * (b2[..., 3] - b2[..., 1] + 1.0)
    union = area1 + area2 - inter
    return inter / jnp.where(union != 0, union, 1.0)


def box_refinement(box: jnp.ndarray, gt_box: jnp.ndarray) -> jnp.ndarray:
    """(dy, dx, log dh, log dw) needed to transform box into gt_box. [N,4]."""
    height = box[:, 2] - box[:, 0]
    width = box[:, 3] - box[:, 1]
    center_y = box[:, 0] + 0.5 * height
    center_x = box[:, 1] + 0.5 * width

    gt_height = gt_box[:, 2] - gt_box[:, 0]
    gt_width = gt_box[:, 3] - gt_box[:, 1]
    gt_center_y = gt_box[:, 0] + 0.5 * gt_height
    gt_center_x = gt_box[:, 1] + 0.5 * gt_width

    safe_h = jnp.where(height != 0, height, 1.0)
    safe_w = jnp.where(width != 0, width, 1.0)
    dy = (gt_center_y - center_y) / safe_h
    dx = (gt_center_x - center_x) / safe_w
    dh = jnp.log(jnp.where((gt_height > 0) & (height > 0), gt_height / safe_h, 1.0))
    dw = jnp.log(jnp.where((gt_width > 0) & (width > 0), gt_width / safe_w, 1.0))
    return jnp.stack([dy, dx, dh, dw], axis=1)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
