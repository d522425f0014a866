"""Regression tests for code-review findings."""

import numpy as np
import pytest

import jax

from sln_amodal_tpu.config import Config
from sln_amodal_tpu.data.pipeline import build_rpn_targets
from sln_amodal_tpu.eval_amodal import rle
from sln_amodal_tpu.ops.anchors import config_anchors
from sln_amodal_tpu.train.optim import StageSchedule, trainable_mask


def test_zero_area_gt_box_no_inf_targets():
    cfg = Config(image_size=64, pre_nms_limit=64)
    anchors = config_anchors(cfg)
    gt_boxes = np.array([[10, 10, 10, 30], [8, 8, 40, 40]], np.float32)  # first is 0-height
    match, deltas = build_rpn_targets(
        anchors, np.array([1, 1]), gt_boxes, cfg, np.random.default_rng(0)
    )
    assert np.isfinite(deltas).all()
    assert (match == 1).sum() >= 1


def test_all_gt_boxes_degenerate():
    cfg = Config(image_size=64, pre_nms_limit=64)
    anchors = config_anchors(cfg)
    gt_boxes = np.zeros((2, 4), np.float32)
    match, deltas = build_rpn_targets(
        anchors, np.array([1, 1]), gt_boxes, cfg, np.random.default_rng(0)
    )
    assert (match == -1).all()
    assert np.isfinite(deltas).all()


@pytest.mark.slow
def test_sticky_freeze_masks_shrink():
    from sln_amodal_tpu.models.sln import init_params

    cfg = Config(image_size=64, glm_input_size=33, compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(0))
    sched = StageSchedule(0.001, sticky_freeze=True)

    def count_true(mask):
        return sum(bool(v) for v in jax.tree_util.tree_leaves(mask))

    m0 = sched.stage_mask(params, 0)   # heads
    m2 = sched.stage_mask(params, 2)   # "all" ∧ "4+" ∧ "heads" = heads
    heads = trainable_mask(params, "heads")
    assert count_true(m2) == count_true(heads) == count_true(m0)
    # and without stickiness, 'all' trains strictly more
    sched_free = StageSchedule(0.001, sticky_freeze=False)
    assert count_true(sched_free.stage_mask(params, 2)) > count_true(m0)


def test_trainable_mask_accepts_precomputed_tree():
    mask = {"params": {"x": True}}
    assert trainable_mask({"params": {"x": 1}}, mask) is mask


def test_zigzag_polygon_no_overflow():
    # a polygon whose boundary travel greatly exceeds h*w crossings bound
    h = w = 40
    pts = []
    for i in range(120):
        x = 1.0 if i % 2 == 0 else 39.0
        y = 1.0 + i * 0.3
        pts.extend([x, y])
    counts = rle.counts_from_poly(pts, h, w)
    # decodes without corruption and round-trips through the string codec
    m = rle.decode_counts(counts, h, w)
    assert m.shape == (h, w)
    back = rle.string_to_counts(rle.counts_to_string(counts))
    np.testing.assert_array_equal(back, counts)


def test_eval_iou_cache_invalidates_on_param_change():
    from tests.test_amodal_eval import make_dt, make_gt, A, B, C
    from sln_amodal_tpu.eval_amodal.amodal_eval import AmodalEval

    gt = make_gt()
    dt = make_dt([(1, A, 0.9), (1, B, 0.8), (2, C, 0.95)])
    ev = AmodalEval(gt, dt)
    s1 = ev.run().copy()
    ev.params.use_amodal_gt = False   # must invalidate the IoU cache
    s2 = ev.run().copy()
    ev.params.use_amodal_gt = True
    s3 = ev.run().copy()
    np.testing.assert_allclose(s1, s3)
