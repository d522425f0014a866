"""Edge-case behavior of the masked static-shape losses.

The divergence-prone spot vs the reference: with NO positive anchors the
reference's ``F.smooth_l1_loss`` over a zero-row gather would crash /
NaN (``/root/reference/loss.py:40-64`` indexes an empty set); our masked
form clamps the denominator and returns exactly 0 — training survives a
sample whose every GT collapsed (the zero-area-GT guard emits all-negative
``rpn_match``). The positive case must still equal the reference's
mean-over-gathered-rows semantics.
"""

import numpy as np

from sln_amodal_tpu.train import losses


def test_rpn_bbox_loss_no_positives_is_zero():
    a = 64
    match = -np.ones((a,), np.int32)  # all negative (zero-GT guard output)
    target = np.random.RandomState(0).randn(a, 4).astype(np.float32)
    pred = np.random.RandomState(1).randn(a, 4).astype(np.float32)
    out = float(losses.rpn_bbox_loss(target, match, pred))
    assert out == 0.0
    assert np.isfinite(out)


def test_rpn_bbox_loss_matches_gathered_mean():
    """sum(l * pos) / (n_pos * 4) == mean over the gathered positive rows —
    the reference's ``F.smooth_l1_loss(pred[pos], target[pos])``."""
    rng = np.random.RandomState(2)
    a = 128
    match = np.zeros((a,), np.int32)
    match[rng.choice(a, 17, replace=False)] = 1
    match[rng.choice(np.where(match == 0)[0], 30, replace=False)] = -1
    target = rng.randn(a, 4).astype(np.float32)
    pred = rng.randn(a, 4).astype(np.float32)

    out = float(losses.rpn_bbox_loss(target, match, pred))
    pos = match == 1
    ref = float(np.mean(np.asarray(
        losses.smooth_l1(pred[pos], target[pos]))))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_rpn_class_loss_no_contributing_is_zero():
    a = 32
    match = np.zeros((a,), np.int32)  # all neutral
    logits = np.random.RandomState(3).randn(a, 2).astype(np.float32)
    assert float(losses.rpn_class_loss(match, logits)) == 0.0


def test_mrcnn_losses_no_positive_rois_are_zero():
    t, c = 8, 2
    class_ids = np.zeros((t,), np.int32)
    out_b = float(losses.mrcnn_bbox_loss(
        np.ones((t, 4), np.float32), class_ids,
        np.ones((t, c, 4), np.float32)))
    out_l = float(losses.layer_loss(
        np.ones((t, 1, 4, 4), np.float32), class_ids,
        np.ones((t, 4, 4, c), np.float32)))
    out_a = float(losses.amodal_loss(
        np.ones((t, 1, 4, 4), np.float32), class_ids,
        np.ones((t, 4, 4, c), np.float32)))
    assert out_b == 0.0
    assert out_l == 0.0 and out_a == 0.0
