"""RLE library tests: round-trips, cross-check native vs numpy fallback, and
string-codec goldens derived from the COCO format spec."""

import numpy as np
import pytest

from sln_amodal_tpu.eval_amodal import rle


def random_mask(rng, h=37, w=23, p=0.4):
    return (rng.rand(h, w) < p).astype(np.uint8)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(10):
        m = random_mask(rng)
        r = rle.encode(np.asfortranarray(m))
        np.testing.assert_array_equal(rle.decode(r), m)


def test_counts_start_with_zeros_run():
    m = np.ones((4, 4), np.uint8)
    c = rle.encode_counts(m)
    assert c[0] == 0 and c[1] == 16


def test_area():
    rng = np.random.RandomState(1)
    m = random_mask(rng)
    r = rle.encode(np.asfortranarray(m))
    assert rle.area(r) == int(m.sum())


def test_string_roundtrip():
    rng = np.random.RandomState(2)
    for _ in range(10):
        m = random_mask(rng, 61, 47)
        c = rle.encode_counts(m)
        s = rle.counts_to_string(c)
        back = rle.string_to_counts(s)
        np.testing.assert_array_equal(back, c)
        assert all(48 <= b <= 111 for b in s)


def test_merge_union_intersect():
    rng = np.random.RandomState(3)
    a = random_mask(rng)
    b = random_mask(rng)
    ra = rle.encode(np.asfortranarray(a))
    rb = rle.encode(np.asfortranarray(b))
    u = rle.decode(rle.merge([ra, rb], intersect=False))
    i = rle.decode(rle.merge([ra, rb], intersect=True))
    np.testing.assert_array_equal(u, (a | b))
    np.testing.assert_array_equal(i, (a & b))


def test_iou_matches_dense():
    rng = np.random.RandomState(4)
    dts = [random_mask(rng) for _ in range(5)]
    gts = [random_mask(rng) for _ in range(3)]
    rd = [rle.encode(np.asfortranarray(m)) for m in dts]
    rg = [rle.encode(np.asfortranarray(m)) for m in gts]
    got = rle.iou(rd, rg, [0, 0, 0])
    assert got.shape == (5, 3)
    for d in range(5):
        for g in range(3):
            inter = (dts[d] & gts[g]).sum()
            union = (dts[d] | gts[g]).sum()
            ref = inter / union if union else 0
            np.testing.assert_allclose(got[d, g], ref, atol=1e-9)


def test_iou_crowd_semantics():
    a = np.zeros((10, 10), np.uint8); a[:5, :5] = 1
    g = np.ones((10, 10), np.uint8)
    rd = [rle.encode(np.asfortranarray(a))]
    rg = [rle.encode(np.asfortranarray(g))]
    out = rle.iou(rd, rg, [1])
    # crowd: union = dt area → iou = inter/area(dt) = 1.0
    np.testing.assert_allclose(out[0, 0], 1.0)


def test_bbox_iou_path():
    dt = np.array([[0, 0, 10, 10]], np.float64)
    gt = np.array([[5, 5, 10, 10]], np.float64)
    out = rle.iou(dt, gt, [0])
    np.testing.assert_allclose(out[0, 0], 25.0 / 175.0)


def test_to_bbox():
    m = np.zeros((12, 9), np.uint8)
    m[3:7, 2:5] = 1
    bb = rle.toBbox(rle.encode(np.asfortranarray(m)))
    np.testing.assert_array_equal(bb, [2, 3, 3, 4])


def test_frpoly_square_area():
    # unit-aligned square: rasterized area should match pixel square
    r = rle.frPyObjects([[1, 1, 1, 6, 6, 6, 6, 1]], 10, 10)[0]
    m = rle.decode(r)
    assert rle.area(r) == m.sum()
    # COCO convention: a polygon (1,1)-(6,6) covers a 5x5 block of pixels
    assert 20 <= m.sum() <= 30
    ys, xs = np.nonzero(m)
    assert ys.min() >= 1 and ys.max() <= 6 and xs.min() >= 1 and xs.max() <= 6


def test_frpoly_matches_fallback():
    rng = np.random.RandomState(5)
    for _ in range(5):
        pts = rng.rand(6, 2) * 20
        poly = pts.reshape(-1).tolist()
        native_counts = rle.counts_from_poly(poly, 25, 25)
        fallback_counts = rle._poly_fallback(np.asarray(poly), 6, 25, 25)
        np.testing.assert_array_equal(native_counts, fallback_counts)


def test_native_library_loads():
    from sln_amodal_tpu.native.build import load_library
    assert load_library() is not None, "native RLE library failed to build"


def test_encode_pasted_matches_full_frame():
    """encode_pasted(crop, y1, x1, H, W) is bit-identical to encoding the
    materialized pasted frame — across random boxes, edge-touching boxes,
    the full-frame box, empty and all-ones crops, and a crop whose first
    frame pixel is 1 (the leading zero-length run quirk)."""
    rng = np.random.RandomState(0)
    H, W = 37, 53
    cases = []
    for _ in range(10):
        h, w = rng.randint(1, H + 1), rng.randint(1, W + 1)
        y1, x1 = rng.randint(0, H - h + 1), rng.randint(0, W - w + 1)
        cases.append((rng.randint(0, 2, (h, w)).astype(np.uint8), y1, x1))
    cases += [
        (np.ones((5, 4), np.uint8), 0, 0),          # first frame pixel is 1
        (np.ones((H, W), np.uint8), 0, 0),          # full-frame box
        (np.zeros((6, 6), np.uint8), 10, 10),       # empty crop
        (np.ones((1, 1), np.uint8), H - 1, W - 1),  # last pixel only
        (np.ones((H, 1), np.uint8), 0, W - 1),      # full right column
    ]
    for crop, y1, x1 in cases:
        h, w = crop.shape
        full = np.zeros((H, W), np.uint8)
        full[y1:y1 + h, x1:x1 + w] = crop
        expect = rle.encode_counts(full)
        got = rle.encode_pasted_counts(crop, y1, x1, H, W)
        np.testing.assert_array_equal(got, expect, err_msg=f"{(y1, x1, h, w)}")
        d = rle.encode_pasted(crop, y1, x1, H, W)
        assert d["size"] == [H, W]
        assert d["counts"] == rle.counts_to_string(expect)


def test_build_coco_results_crops_matches_full():
    """The crops-based results builder emits dicts identical to the
    full-frame builder for the same detections."""
    from sln_amodal_tpu.eval_amodal.coco_results import (
        build_coco_results,
        build_coco_results_crops,
    )

    rng = np.random.RandomState(1)
    H = Wd = 64
    n = 5
    rois = np.zeros((n, 4), np.int32)
    crops = []
    masks = np.zeros((H, Wd, n), np.uint8)
    for i in range(n):
        y1, x1 = rng.randint(0, 40, 2)
        h, w = rng.randint(2, 20, 2)
        rois[i] = [y1, x1, y1 + h, x1 + w]
        c = rng.randint(0, 2, (h, w)).astype(np.uint8)
        crops.append(c)
        masks[y1:y1 + h, x1:x1 + w, i] = c
    class_ids = np.ones(n, np.int32)
    scores = rng.rand(n).astype(np.float32)

    a = build_coco_results(7, rois, class_ids, scores, masks)
    b = build_coco_results_crops(7, rois, class_ids, scores, crops, (H, Wd))
    assert a == b
