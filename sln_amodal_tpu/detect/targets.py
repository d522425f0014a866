"""Detection-target layer (training): sample ROIs, build head targets.

Static-shape re-design of the reference's dynamic sampler
(``/root/reference/modal/Functions.py:223-416``):

- positives: proposals with IoU >= 0.5 against any GT box; random subsample
  to at most ``train_rois * roi_positive_ratio`` (70 by default);
- negatives: IoU < 0.5 (and away from crowd boxes), count =
  ``int(pos / ratio) - pos`` (30 for 70 positives at ratio 0.7);
- per positive: assigned GT box → normalized deltas (/ BBOX_STD_DEV) and the
  GT layer-mask stack cropped to the ROI at ``mask_shape`` with
  crop-and-resize then rounded to {0,1} (Functions.py:339-346);
- negatives get class 0 and zero deltas/masks.

Instead of concatenating variable-size positive/negative sets, a fixed
[train_rois] table is produced: slots [0, n_pos) positives, [n_pos,
n_pos+n_neg) negatives, the rest padding — with ``roi_valid`` marking real
rows. Randomness comes from explicit ``jax.random`` keys (documented
divergence from the reference's torch RNG; parity matters for eval, not for
training trajectories — SURVEY.md §7).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.boxes import box_iou, box_refinement
from ..ops.roi_align import crop_and_resize_blocked as crop_and_resize


class RoiTargets(NamedTuple):
    rois: jnp.ndarray          # [T, 4] normalized
    class_ids: jnp.ndarray     # [T] int32 (0 = bg / padding)
    deltas: jnp.ndarray        # [T, 4]
    masks: jnp.ndarray         # [T, L, mh, mw] {0,1}
    valid: jnp.ndarray         # [T] bool — real (pos or neg) rows
    positive: jnp.ndarray      # [T] bool


def detection_target_layer(
    rng: jax.Array,
    proposals: jnp.ndarray,
    proposal_valid: jnp.ndarray,
    gt_class_ids: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_masks: jnp.ndarray,
    *,
    train_rois: int,
    roi_positive_ratio: float,
    mask_shape,
    bbox_std_dev,
) -> RoiTargets:
    """Per-image target sampling.

    Args:
        proposals: [P, 4] normalized, zero-padded.
        proposal_valid: [P] bool.
        gt_class_ids: [G] int32, 0 = padding, < 0 = crowd.
        gt_boxes: [G, 4] normalized, zero-padded.
        gt_masks: [G, L, H, W] float/bool layer masks, zero-padded along G.
    """
    p = proposals.shape[0]
    g = gt_boxes.shape[0]
    t = train_rois
    mh, mw = mask_shape
    num_layers = gt_masks.shape[1]

    gt_real = gt_class_ids > 0
    crowd = gt_class_ids < 0

    overlaps = box_iou(proposals, gt_boxes)  # [P, G]
    overlaps_real = jnp.where(gt_real[None, :], overlaps, -1.0)
    roi_iou_max = jnp.max(overlaps_real, axis=1)

    crowd_overlap = jnp.where(crowd[None, :], overlaps, 0.0)
    crowd_iou_max = jnp.max(crowd_overlap, axis=1) if g else jnp.zeros((p,))
    no_crowd = crowd_iou_max < 0.001

    positive = (roi_iou_max >= 0.5) & proposal_valid
    negative = (roi_iou_max < 0.5) & no_crowd & proposal_valid

    k_pos, k_neg = jax.random.split(rng)

    max_pos = int(train_rois * roi_positive_ratio)

    # Random subsample of positives: random priority, take up to max_pos.
    pos_rank = jnp.where(positive, jax.random.uniform(k_pos, (p,)), jnp.inf)
    pos_order = jnp.argsort(pos_rank)               # positives first, shuffled
    n_pos = jnp.minimum(jnp.sum(positive), max_pos)

    neg_rank = jnp.where(negative, jax.random.uniform(k_neg, (p,)), jnp.inf)
    neg_order = jnp.argsort(neg_rank)
    # negative_count = int(pos / ratio) - pos  (Functions.py:357-358)
    want_neg = (n_pos.astype(jnp.float32) / roi_positive_ratio).astype(jnp.int32) - n_pos
    n_neg = jnp.minimum(jnp.sum(negative), jnp.maximum(want_neg, 0))
    # The reference only adds negatives when there are positives.
    n_neg = jnp.where(n_pos > 0, n_neg, 0)

    slot = jnp.arange(t)
    is_pos_slot = slot < n_pos
    is_neg_slot = (slot >= n_pos) & (slot < n_pos + n_neg)
    valid = is_pos_slot | is_neg_slot

    pos_take = pos_order[jnp.minimum(slot, p - 1)]
    neg_idx_in_order = jnp.clip(slot - n_pos, 0, p - 1)
    neg_take = neg_order[neg_idx_in_order]
    src = jnp.where(is_pos_slot, pos_take, neg_take)

    rois = jnp.where(valid[:, None], proposals[src], 0.0)

    # --- positive targets -------------------------------------------------
    assign = jnp.argmax(overlaps_real[src], axis=1)        # [T]
    roi_gt_boxes = gt_boxes[assign]
    class_ids = jnp.where(is_pos_slot, gt_class_ids[assign], 0).astype(jnp.int32)

    deltas = box_refinement(rois, roi_gt_boxes) / jnp.asarray(bbox_std_dev, jnp.float32)
    deltas = jnp.where(is_pos_slot[:, None], deltas, 0.0)

    # Crop assigned GT layer masks to each ROI box: gt_masks [G, L, H, W] →
    # treat (G·L) as batch of single-channel images, crop with box index
    # pointing at the assigned instance.
    gh, gw = gt_masks.shape[2], gt_masks.shape[3]
    mask_imgs = gt_masks.reshape(g * num_layers, gh, gw, 1).astype(jnp.float32)
    # box index of slot s for layer l: assign[s] * L + l
    box_per_slot = jnp.repeat(rois, num_layers, axis=0)          # [T*L, 4]
    ind = (assign[:, None] * num_layers + jnp.arange(num_layers)[None, :]).reshape(-1)
    crops = crop_and_resize(mask_imgs, box_per_slot, ind, (mh, mw))  # [T*L,mh,mw,1]
    masks = crops.reshape(t, num_layers, mh, mw)
    masks = jnp.round(masks)
    masks = jnp.where(is_pos_slot[:, None, None, None], masks, 0.0)

    return RoiTargets(
        rois=rois,
        class_ids=class_ids,
        deltas=deltas,
        masks=masks,
        valid=valid,
        positive=is_pos_slot,
    )
