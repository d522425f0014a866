"""Amodal evaluator tests on hand-built tiny GT/DT."""

import numpy as np
import pytest

from sln_amodal_tpu.data.dataset import AmodalCoco, DetectionResults
from sln_amodal_tpu.eval_amodal import rle
from sln_amodal_tpu.eval_amodal.amodal_eval import AmodalEval, evaluate_sweep
from sln_amodal_tpu.eval_amodal.coco_results import build_coco_results

H = W = 50


def sq(y1, x1, y2, x2):
    m = np.zeros((H, W), np.uint8)
    m[y1:y2, x1:x2] = 1
    return m


def rle_str(mask):
    r = rle.encode(np.asfortranarray(mask))
    return {"size": r["size"], "counts": r["counts"].decode()}


A = sq(5, 5, 25, 25)
B = sq(20, 20, 45, 45)
C = sq(10, 10, 40, 40)


def region(mask, order, occ, stuff):
    return {
        "segmentation": rle_str(mask),
        "visible_mask": rle_str(mask),
        "order": order,
        "amodal_region": {"order": order},
        "occlude_rate": occ,
        "isStuff": stuff,
    }


def make_gt():
    dataset = {
        "images": [
            {"id": 1, "height": H, "width": W, "file_name": "a.jpg"},
            {"id": 2, "height": H, "width": W, "file_name": "b.jpg"},
        ],
        "annotations": [
            {
                "id": 10,
                "image_id": 1,
                "regions": [
                    region(A, 1, 0.0, 0),
                    region(B, 2, 0.4, 1),
                ],
            },
            {"id": 11, "image_id": 2, "regions": [region(C, 1, 0.1, 0)]},
        ],
    }
    return AmodalCoco(dataset=dataset)


def make_dt(masks_scores):
    """masks_scores: list of (image_id, mask, score)."""
    results = []
    for img_id, mask, score in masks_scores:
        results.append(
            {
                "image_id": img_id,
                "category_id": 1,
                "score": score,
                "segmentation": rle.encode(np.asfortranarray(mask)),
            }
        )
    return DetectionResults(results)


def test_perfect_detections_ap1():
    gt = make_gt()
    dt = make_dt([(1, A, 0.9), (1, B, 0.8), (2, C, 0.95)])
    ev = AmodalEval(gt, dt)
    stats = ev.run()
    np.testing.assert_allclose(stats[0], 1.0)   # AP
    np.testing.assert_allclose(stats[1], 1.0)   # AP50
    np.testing.assert_allclose(stats[5], 1.0)   # AR@100


def test_missing_detection_lowers_recall():
    gt = make_gt()
    dt = make_dt([(1, A, 0.9), (2, C, 0.95)])   # B missing
    ev = AmodalEval(gt, dt)
    stats = ev.run()
    assert stats[5] == pytest.approx(2.0 / 3.0)
    assert stats[0] < 1.0


def test_false_positive_lowers_precision():
    gt = make_gt()
    fp = sq(0, 30, 10, 49)
    dt = make_dt([(1, A, 0.9), (1, B, 0.8), (2, C, 0.95), (2, fp, 0.99)])
    ev = AmodalEval(gt, dt)
    stats = ev.run()
    assert stats[0] < 1.0
    assert stats[5] == pytest.approx(1.0)  # recall unaffected


def test_occlusion_slices():
    gt = make_gt()
    dt = make_dt([(1, A, 0.9), (1, B, 0.8), (2, C, 0.95)])
    ev = AmodalEval(gt, dt)

    ev.params.occ_rng = [0.25, 1]      # heavy → only B counted
    stats = ev.run()
    np.testing.assert_allclose(stats[0], 1.0)

    ev.params.occ_rng = [0, 0.00001]   # none → only A
    stats = ev.run()
    np.testing.assert_allclose(stats[0], 1.0)


def test_things_stuff_slices():
    gt = make_gt()
    # B (stuff) not detected; things AP should still be perfect,
    # stuff recall zero.
    dt = make_dt([(1, A, 0.9), (2, C, 0.95)])
    ev = AmodalEval(gt, dt)
    ev.params.only_things = 1
    stats = ev.run()
    np.testing.assert_allclose(stats[0], 1.0)
    ev.params.only_things = 2
    stats = ev.run()
    assert stats[5] == pytest.approx(0.0)


def test_sweep_runs_all_12():
    gt = make_gt()
    dt = make_dt([(1, A, 0.9), (1, B, 0.8), (2, C, 0.95)])
    ev = AmodalEval(gt, dt)
    res = evaluate_sweep(ev, verbose=False)
    assert len(res) == 12
    np.testing.assert_allclose(res["both/all"][0], 1.0)


def test_d2sa_order_key():
    gt = make_gt()
    dt = make_dt([(1, A, 0.9), (1, B, 0.8), (2, C, 0.95)])
    ev = AmodalEval(gt, dt, order_key="amodal_region.order")
    stats = ev.run()
    np.testing.assert_allclose(stats[0], 1.0)


def test_match_records_gt_order():
    gt = make_gt()
    dt = make_dt([(1, B, 0.8), (1, A, 0.9)])
    ev = AmodalEval(gt, dt)
    ev.evaluate()
    e = [x for x in ev.eval_imgs if x and x["image_id"] == 1][0]
    # detections sorted by score: A (0.9) then B (0.8); matched orders 1, 2
    assert e["dt_matches"][0].tolist() == [1.0, 2.0]


def test_build_coco_results_roundtrip():
    masks = np.stack([A, B], axis=2)
    rois = np.array([[5, 5, 25, 25], [20, 20, 45, 45]], np.float32)
    res = build_coco_results(7, rois, np.array([1, 1]), np.array([0.9, 0.8]), masks)
    assert len(res) == 2
    assert res[0]["image_id"] == 7
    assert res[0]["bbox"] == [5.0, 5.0, 20.0, 20.0]
    np.testing.assert_array_equal(rle.decode(res[0]["segmentation"]), A)


def test_visible_mask_eval_mode():
    gt = make_gt()
    dt = make_dt([(1, A, 0.9), (1, B, 0.8), (2, C, 0.95)])
    ev = AmodalEval(gt, dt)
    ev.params.use_amodal_gt = False   # match against visible masks
    stats = ev.run()
    np.testing.assert_allclose(stats[0], 1.0)
