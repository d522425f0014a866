"""Detection layer (inference): classify, refine, filter to final detections.

Static-shape equivalent of ``refine_detections`` / ``detection_layer``
(``/root/reference/modal/Functions.py:423-575``) with the shipped
``USE_NMS = False`` semantics:

- per-ROI argmax class + class-specific deltas (scaled by RPN_BBOX_STD_DEV,
  matching ``coordinate_convert`` Functions.py:439),
- scale to pixel coords, clip to the image-meta window, round,
- keep foreground (class_id > 0), top ``detection_max_instances`` by score,
  sorted descending. NOTE: in the reference the *live* cap is the hardcoded
  100 of the USE_NMS=False branch (Functions.py:531) — its
  ``DETECTION_MAX_INSTANCES`` feeds a dead variable (``roi_count``,
  Functions.py:548) and the ``[:]`` slice at :551 caps nothing. Our knob is
  the effective cap; parity with the reference = setting it to 100 (the
  config default), as pinned by tests/test_ref_model_import.py.
- output rows (y1, x1, y2, x2, class_id, score) in pixels; empty slots are
  all-zero (class_id 0), which downstream unmolding uses as the cutoff —
  same convention as the reference's zero padding.

The optional per-class-NMS branch (USE_NMS=True, Functions.py:492-525) is
implemented too, for API completeness.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import apply_box_deltas, clip_boxes
from ..ops.nms import nms_sorted


def refine_detections(
    rois: jnp.ndarray,
    roi_valid: jnp.ndarray,
    probs: jnp.ndarray,
    deltas: jnp.ndarray,
    window,
    *,
    image_size: int,
    bbox_std_dev,
    max_instances: int,
    min_confidence: float = 0.0,
    use_nms: bool = False,
    nms_threshold: float = 0.3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image detection refinement.

    Args:
        rois: [R, 4] normalized proposals (zero-padded).
        roi_valid: [R] bool.
        probs: [R, C] class probabilities.
        deltas: [R, C, 4] class-specific refinements.
        window: (y1, x1, y2, x2) pixel window containing the real image.

    Returns:
        detections: [max_instances, 6] (y1, x1, y2, x2, class_id, score),
            pixel coords, zero rows past the last detection.
        valid: [max_instances] bool.
    """
    r = rois.shape[0]
    class_ids = jnp.argmax(probs, axis=1)
    idx = jnp.arange(r)
    class_scores = probs[idx, class_ids]
    deltas_specific = deltas[idx, class_ids]

    dt = jnp.promote_types(rois.dtype, jnp.float32)
    std = jnp.asarray(bbox_std_dev, dt)
    refined = apply_box_deltas(rois.astype(dt), deltas_specific.astype(dt) * std[None])
    refined = refined * float(image_size)

    refined = jnp.round(clip_boxes(refined, window))

    keep = (class_ids > 0) & roi_valid
    if min_confidence > 0:
        keep = keep & (class_scores >= min_confidence)

    if use_nms:
        # Per-class NMS. With the single-foreground-class setup there is one
        # class; run NMS over kept boxes sorted by score.
        score_key = jnp.where(keep, class_scores, -jnp.inf)
        order = jnp.argsort(-score_key)
        sorted_boxes = refined[order]
        sorted_valid = keep[order]
        nms_keep, nms_valid = nms_sorted(
            sorted_boxes,
            sorted_valid,
            max_outputs=r,
            iou_threshold=nms_threshold,
            plus_one=True,
        )
        target = jnp.where(nms_valid, order[jnp.maximum(nms_keep, 0)], r)
        keep_after = jnp.zeros((r,), bool).at[target].set(True, mode="drop")
        keep = keep & keep_after

    # Top-max_instances by score among kept, sorted descending
    # (Functions.py:528-547: cap at 100 then sort).
    score_key = jnp.where(keep, class_scores, -jnp.inf)
    k = min(max_instances, r)
    top_scores, top_idx = jax.lax.top_k(score_key, k)
    valid = top_scores > -jnp.inf

    det_boxes = refined[top_idx]
    det_ids = class_ids[top_idx].astype(jnp.float32)
    det_scores = class_scores[top_idx]
    detections = jnp.concatenate(
        [det_boxes, det_ids[:, None], det_scores[:, None]], axis=1
    )
    detections = jnp.where(valid[:, None], detections, 0.0)
    if k < max_instances:
        detections = jnp.pad(detections, ((0, max_instances - k), (0, 0)))
        valid = jnp.pad(valid, (0, max_instances - k))
    return detections, valid
