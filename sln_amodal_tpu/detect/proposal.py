"""Proposal layer: RPN outputs → top-K → deltas → clip → NMS → padded ROIs.

Static-shape equivalent of the reference proposal layer
(``/root/reference/modal/Functions.py:114-178``): scores sorted descending,
top ``pre_nms_limit`` anchors refined by (deltas * RPN_BBOX_STD_DEV), clipped
to the image, greedy NMS (legacy +1 IoU, suppress at ``>``), top
``proposal_count`` kept, normalized to [0, 1].

Everything is per-image; batch via ``jax.vmap``. Outputs are fixed-size with
a validity mask instead of the reference's variable-length tensor.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import apply_box_deltas, clip_boxes
from ..ops.nms import nms_sorted
from ..ops.nms_pallas import nms_sorted_pallas, nms_sorted_pallas_batched


def _nms_dispatch(impl: str):
    """'pallas' | 'xla' | 'auto' (pallas on TPU, xla elsewhere)."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"
    return nms_sorted_pallas if impl == "pallas" else nms_sorted


def _nms_dispatch_batched(impl: str):
    """Batched NMS ([B, N, 4] boxes, [B, N] valid): the batch-grid Pallas
    kernel on TPU, the vmapped XLA loop elsewhere (bit-identical contracts,
    pinned by tests/test_nms_pallas)."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"
    if impl == "pallas":
        return nms_sorted_pallas_batched

    def batched_xla(boxes, valid, *, max_outputs, iou_threshold,
                    plus_one=True, suppress_at_equal=False, pad_value=-1):
        # full keyword parity with nms_sorted_pallas_batched so a caller
        # passing the rarer knobs behaves identically on the non-TPU path
        return jax.vmap(lambda b, v: nms_sorted(
            b, v, max_outputs=max_outputs, iou_threshold=iou_threshold,
            plus_one=plus_one, suppress_at_equal=suppress_at_equal,
            pad_value=pad_value))(boxes, valid)

    return batched_xla


def proposal_layer(
    rpn_probs: jnp.ndarray,
    rpn_deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    *,
    proposal_count: int,
    nms_threshold: float,
    image_size: int,
    rpn_bbox_std_dev,
    pre_nms_limit: int = 6000,
    nms_impl: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image proposals.

    Args:
        rpn_probs: [A, 2] softmax over (bg, fg) per anchor.
        rpn_deltas: [A, 4] predicted refinements.
        anchors: [A, 4] pixel-coordinate anchors.

    Returns:
        proposals: [proposal_count, 4] normalized (y1, x1, y2, x2), zero-padded.
        valid: [proposal_count] bool.
    """
    scores = rpn_probs[:, 1]
    # box math in at-least-f32 (f64 under x64 parity testing; bf16 inputs
    # are promoted so coordinates never round through bf16)
    dt = jnp.promote_types(rpn_deltas.dtype, jnp.float32)
    std = jnp.asarray(rpn_bbox_std_dev, dt)
    deltas = rpn_deltas.astype(dt) * std[None, :]

    k = min(pre_nms_limit, anchors.shape[0])
    top_scores, order = jax.lax.top_k(scores, k)
    deltas = deltas[order]
    top_anchors = anchors[order]

    boxes = apply_box_deltas(top_anchors.astype(dt), deltas)
    boxes = clip_boxes(boxes, (0.0, 0.0, float(image_size), float(image_size)))

    keep, keep_valid = _nms_dispatch(nms_impl)(
        boxes,
        jnp.ones((k,), bool),
        max_outputs=proposal_count,
        iou_threshold=nms_threshold,
        plus_one=True,
    )
    kept = boxes[jnp.maximum(keep, 0)]
    kept = jnp.where(keep_valid[:, None], kept, 0.0)
    normalized = kept / float(image_size)
    return normalized, keep_valid


def proposal_layer_batched(
    rpn_probs: jnp.ndarray,
    rpn_deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    *,
    proposal_count: int,
    nms_threshold: float,
    image_size: int,
    rpn_bbox_std_dev,
    pre_nms_limit: int = 6000,
    nms_impl: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-native :func:`proposal_layer`: every stage is one batched op
    instead of a per-image vmap body — ``top_k`` over [B, A] (XLA's batched
    sort), ``take_along_axis`` gathers, broadcast box math, and ONE
    batch-grid Pallas NMS call — so nothing pays per-image dispatch and the
    batch-1 slice is exactly the single-image program (models/sln.py used
    to special-case b=1 because vmap's batching rules cost 2× there).

    Args:
        rpn_probs: [B, A, 2] softmax over (bg, fg) per anchor.
        rpn_deltas: [B, A, 4] predicted refinements.
        anchors: [A, 4] pixel-coordinate anchors (shared across the batch).

    Returns:
        proposals: [B, proposal_count, 4] normalized, zero-padded.
        valid: [B, proposal_count] bool.
    """
    scores = rpn_probs[..., 1]                                   # [B, A]
    dt = jnp.promote_types(rpn_deltas.dtype, jnp.float32)
    std = jnp.asarray(rpn_bbox_std_dev, dt)
    deltas = rpn_deltas.astype(dt) * std

    k = min(pre_nms_limit, anchors.shape[0])
    _, order = jax.lax.top_k(scores, k)                          # [B, k]
    deltas = jnp.take_along_axis(deltas, order[..., None], axis=1)
    top_anchors = anchors[order]                                 # [B, k, 4]

    boxes = apply_box_deltas(top_anchors.astype(dt), deltas)
    boxes = clip_boxes(boxes, (0.0, 0.0, float(image_size), float(image_size)))

    keep, keep_valid = _nms_dispatch_batched(nms_impl)(
        boxes,
        jnp.ones(boxes.shape[:2], bool),
        max_outputs=proposal_count,
        iou_threshold=nms_threshold,
        plus_one=True,
    )
    kept = jnp.take_along_axis(
        boxes, jnp.maximum(keep, 0)[..., None], axis=1)
    kept = jnp.where(keep_valid[..., None], kept, 0.0)
    return kept / float(image_size), keep_valid
