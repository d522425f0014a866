"""Training losses (masked static-shape equivalents of
``/root/reference/modal/loss.py:10-253``).

The reference gathers dynamic index sets (``torch.nonzero``) and means over
them; here every loss is a masked mean over fixed-size tensors — identical
values, jit-stable shapes. BCE terms use the numerically-stable
logit formulation (the reference applies ``F.binary_cross_entropy`` to
``sigmoid`` outputs — mathematically the same).

Total training loss = rpn_class + rpn_bbox + mrcnn_class + mrcnn_bbox +
layer + amodal (``/root/reference/model.py:423-436``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    mask = mask.astype(values.dtype)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(values * mask) / denom


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise smooth-L1 (huber, beta=1) — torch F.smooth_l1_loss core."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy on logits (stable)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def rpn_class_loss(rpn_match: jnp.ndarray, rpn_logits: jnp.ndarray) -> jnp.ndarray:
    """CE over anchors with match != 0; positives are class 1.

    rpn_match: [A] int (-1 neg, 0 neutral, +1 pos). rpn_logits: [A, 2].
    """
    contributing = rpn_match != 0
    target = (rpn_match == 1).astype(jnp.int32)
    logp = jax.nn.log_softmax(rpn_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, target[:, None], axis=1)[:, 0]
    return _masked_mean(ce, contributing)


def rpn_bbox_loss(
    rpn_target_deltas: jnp.ndarray, rpn_match: jnp.ndarray, rpn_pred_deltas: jnp.ndarray
) -> jnp.ndarray:
    """Smooth-L1 over positive anchors.

    rpn_target_deltas: [A, 4] per-anchor targets (aligned to anchor index —
    our pipeline emits them aligned rather than compacted like the reference's
    [256, 4] buffer; the masked mean is identical).
    """
    pos = (rpn_match == 1).astype(jnp.float32)
    l = smooth_l1(rpn_pred_deltas.astype(jnp.float32), rpn_target_deltas)
    denom = jnp.maximum(jnp.sum(pos) * 4.0, 1.0)
    return jnp.sum(l * pos[:, None]) / denom


def mrcnn_class_loss(
    target_class_ids: jnp.ndarray, logits: jnp.ndarray, roi_valid: jnp.ndarray
) -> jnp.ndarray:
    """CE over real ROI slots (positives + sampled negatives)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, target_class_ids[:, None].astype(jnp.int32), axis=1)[:, 0]
    return _masked_mean(ce, roi_valid)


def mrcnn_bbox_loss(
    target_deltas: jnp.ndarray, target_class_ids: jnp.ndarray, pred_deltas: jnp.ndarray
) -> jnp.ndarray:
    """Smooth-L1 on the target-class delta of each positive ROI.

    pred_deltas: [T, C, 4]; the class-specific row is gathered per ROI.
    """
    t = target_class_ids.shape[0]
    pos = target_class_ids > 0
    cls = jnp.maximum(target_class_ids.astype(jnp.int32), 0)
    picked = pred_deltas[jnp.arange(t), cls]  # [T, 4]
    l = smooth_l1(picked.astype(jnp.float32), target_deltas.astype(jnp.float32))
    denom = jnp.maximum(jnp.sum(pos.astype(jnp.float32)) * 4.0, 1.0)
    return jnp.sum(l * pos[:, None].astype(jnp.float32)) / denom


def layer_loss(
    target_masks: jnp.ndarray, target_class_ids: jnp.ndarray, pred_logits: jnp.ndarray
) -> jnp.ndarray:
    """BCE between sigmoid(pred channels 1:) and the GT layer stack, over
    positive ROIs (loss.py:129-148).

    target_masks: [T, L, mh, mw]; pred_logits: [T, mh, mw, C] (NHWC) with
    C = L + 1 channels; channels 1: are the layers.
    """
    pos = target_class_ids > 0
    pred = jnp.moveaxis(pred_logits[..., 1:], -1, 1)  # [T, L, mh, mw]
    l = bce_with_logits(pred.astype(jnp.float32), target_masks.astype(jnp.float32))
    per_roi = jnp.mean(l, axis=(1, 2, 3))
    return _masked_mean(per_roi, pos)


def amodal_loss(
    target_masks: jnp.ndarray, target_class_ids: jnp.ndarray, pred_logits: jnp.ndarray
) -> jnp.ndarray:
    """BCE between sigmoid(sum of layer logits) and the layer-union GT over
    positive ROIs (loss.py:113-124: y_true = sum over layer channels)."""
    pos = target_class_ids > 0
    summed_logits = jnp.sum(pred_logits[..., 1:], axis=-1)       # [T, mh, mw]
    y_true = jnp.sum(target_masks.astype(jnp.float32), axis=1)   # [T, mh, mw]
    l = bce_with_logits(summed_logits.astype(jnp.float32), y_true)
    per_roi = jnp.mean(l, axis=(1, 2))
    return _masked_mean(per_roi, pos)


def total_loss(
    *,
    rpn_match,
    rpn_target_deltas,
    rpn_logits,
    rpn_pred_deltas,
    target_class_ids,
    roi_valid,
    mrcnn_class_logits,
    target_deltas,
    mrcnn_pred_deltas,
    target_masks,
    mask_logits,
) -> Dict[str, jnp.ndarray]:
    """All six loss terms + their sum (model.py:423-436)."""
    losses = {
        "rpn_class": rpn_class_loss(rpn_match, rpn_logits),
        "rpn_bbox": rpn_bbox_loss(rpn_target_deltas, rpn_match, rpn_pred_deltas),
        "mrcnn_class": mrcnn_class_loss(target_class_ids, mrcnn_class_logits, roi_valid),
        "mrcnn_bbox": mrcnn_bbox_loss(target_deltas, target_class_ids, mrcnn_pred_deltas),
        "layer": layer_loss(target_masks, target_class_ids, mask_logits),
        "amodal": amodal_loss(target_masks, target_class_ids, mask_logits),
    }
    losses["total"] = sum(losses.values())
    return losses
