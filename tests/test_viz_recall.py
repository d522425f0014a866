"""Visualizer + proposal-recall evaluator tests (host-side, no device)."""

import numpy as np

from sln_amodal_tpu.eval_amodal import rle
from sln_amodal_tpu.eval_amodal.recall import bbox_overlaps, evaluate_recall
from sln_amodal_tpu import viz


def _region(mask, order):
    r = rle.encode(np.asfortranarray(mask.astype(np.uint8)))
    return {
        "segmentation": {"size": r["size"], "counts": r["counts"].decode()},
        "order": order,
    }


def test_show_amodal_anns_paints_pixels(tmp_path):
    img = np.zeros((32, 32, 3), np.uint8)
    m1 = np.zeros((32, 32), np.uint8)
    m1[4:20, 4:20] = 1
    m2 = np.zeros((32, 32), np.uint8)
    m2[10:28, 10:28] = 1
    out = viz.show_amodal_anns(
        img, [_region(m1, 1), _region(m2, 2)], path=str(tmp_path / "a.png")
    )
    assert out.shape == img.shape
    assert out[12, 12].any()          # painted
    assert not out[0, 0].any()        # background untouched
    assert (tmp_path / "a.png").exists()


def test_overlay_detections():
    img = np.zeros((32, 32, 3), np.uint8)
    masks = np.zeros((32, 32, 2), np.uint8)
    masks[2:10, 2:10, 0] = 1
    masks[15:25, 15:25, 1] = 1
    rois = np.array([[2, 2, 10, 10], [15, 15, 25, 25]])
    out = viz.overlay_detections(img, rois, np.array([0.9, 0.5]), masks)
    assert out[5, 5].any() and out[20, 20].any()


def test_bbox_overlaps_identity():
    b = np.array([[0, 0, 9, 9]], float)
    np.testing.assert_allclose(bbox_overlaps(b, b)[0, 0], 1.0)


def test_evaluate_recall_perfect():
    gt = [np.array([[0, 0, 10, 10], [20, 20, 40, 40]], float)]
    props = [np.array([[0, 0, 10, 10], [20, 20, 40, 40], [5, 5, 9, 9]], float)]
    res = evaluate_recall(props, gt)
    assert res["num_pos"] == 2
    np.testing.assert_allclose(res["ar"], 1.0)


def test_evaluate_recall_partial():
    gt = [np.array([[0, 0, 10, 10], [20, 20, 40, 40]], float)]
    props = [np.array([[0, 0, 10, 10]], float)]   # only one found
    res = evaluate_recall(props, gt)
    np.testing.assert_allclose(res["ar"], 0.5)


def test_evaluate_recall_area_slice():
    gt = [np.array([[0, 0, 10, 10], [0, 0, 100, 100]], float)]
    props = [np.array([[0, 0, 100, 100]], float)]
    res = evaluate_recall(props, gt, area="small")   # only the 10x10 counts
    assert res["num_pos"] == 1
    np.testing.assert_allclose(res["ar"], 0.0)
