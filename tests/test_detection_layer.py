"""Golden tests for the detection layer (refine_detections semantics,
Functions.py:423-603 with USE_NMS=False)."""

import numpy as np

import jax.numpy as jnp

from sln_amodal_tpu.detect.detection import refine_detections


def run(rois, valid, probs, deltas, **kw):
    base = dict(
        window=(0.0, 0.0, 100.0, 100.0),
        image_size=100,
        bbox_std_dev=(0.1, 0.1, 0.2, 0.2),
        max_instances=4,
        min_confidence=0.0,
        use_nms=False,
    )
    base.update(kw)
    return refine_detections(
        jnp.asarray(rois, jnp.float32),
        jnp.asarray(valid),
        jnp.asarray(probs, jnp.float32),
        jnp.asarray(deltas, jnp.float32),
        **base,
    )


def test_background_rois_dropped_and_sorted_by_score():
    rois = np.array(
        [[0.1, 0.1, 0.3, 0.3], [0.4, 0.4, 0.6, 0.6], [0.2, 0.6, 0.5, 0.9],
         [0.7, 0.7, 0.9, 0.9]]
    )
    probs = np.array(
        [[0.2, 0.8], [0.9, 0.1], [0.4, 0.6], [0.05, 0.95]]  # bg for roi 1
    )
    deltas = np.zeros((4, 2, 4))
    det, valid = run(rois, np.ones(4, bool), probs, deltas)
    det = np.asarray(det)
    assert np.asarray(valid).tolist() == [True, True, True, False]
    # sorted by score: roi3 (.95), roi0 (.8), roi2 (.6)
    np.testing.assert_allclose(det[0, :4], [70, 70, 90, 90])
    np.testing.assert_allclose(det[0, 4:], [1, 0.95])
    np.testing.assert_allclose(det[1, :4], [10, 10, 30, 30])
    np.testing.assert_allclose(det[2, 5], 0.6)
    # padding row fully zero (the unmold cutoff convention)
    assert np.all(det[3] == 0)


def test_invalid_rois_excluded():
    rois = np.tile(np.array([[0.1, 0.1, 0.3, 0.3]]), (3, 1))
    probs = np.tile(np.array([[0.1, 0.9]]), (3, 1))
    deltas = np.zeros((3, 2, 4))
    det, valid = run(rois, np.array([True, False, True]), probs, deltas)
    assert int(np.asarray(valid).sum()) == 2


def test_min_confidence_filter():
    rois = np.array([[0.1, 0.1, 0.3, 0.3], [0.5, 0.5, 0.7, 0.7]])
    probs = np.array([[0.2, 0.8], [0.45, 0.55]])
    deltas = np.zeros((2, 2, 4))
    det, valid = run(rois, np.ones(2, bool), probs, deltas, min_confidence=0.7)
    assert int(np.asarray(valid).sum()) == 1
    np.testing.assert_allclose(np.asarray(det)[0, 5], 0.8)


def test_deltas_applied_with_std_and_window_clip():
    rois = np.array([[0.4, 0.4, 0.6, 0.6]])
    probs = np.array([[0.1, 0.9]])
    # class-1 delta: shift +1σ in y (=0.1·0.2 normalized units = 2px), and
    # log-scale dh by 0.2·5=1 → height e¹≈2.72× (then rounded)
    deltas = np.zeros((1, 2, 4))
    deltas[0, 1] = [1.0, 0.0, 5.0, 0.0]
    det, valid = run(rois, np.ones(1, bool), probs, deltas)
    y1, x1, y2, x2 = np.asarray(det)[0, :4]
    h = y2 - y1
    assert 50 < h <= 55  # 20px · e¹ ≈ 54.4 clipped/rounded
    assert x2 - x1 == 20
    assert 0 <= y1 and y2 <= 100


def test_per_class_nms_path():
    # two heavily overlapping fg boxes + one separate: NMS keeps 2
    rois = np.array(
        [[0.1, 0.1, 0.3, 0.3], [0.11, 0.11, 0.31, 0.31], [0.6, 0.6, 0.8, 0.8]]
    )
    probs = np.array([[0.1, 0.9], [0.2, 0.8], [0.3, 0.7]])
    deltas = np.zeros((3, 2, 4))
    det, valid = run(
        rois, np.ones(3, bool), probs, deltas, use_nms=True, nms_threshold=0.3
    )
    assert int(np.asarray(valid).sum()) == 2
    scores = np.asarray(det)[:2, 5]
    np.testing.assert_allclose(scores, [0.9, 0.7])
