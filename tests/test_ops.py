"""Ops tests against independent numpy oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sln_amodal_tpu.ops import anchors, boxes, nms, roi_align


# ---------------------------------------------------------------- oracles ---


def np_greedy_nms(b, thresh, plus_one=True, suppress_at_equal=False):
    """Straightforward greedy NMS oracle over score-sorted boxes [N,4]."""
    n = len(b)
    add = 1.0 if plus_one else 0.0
    suppressed = np.zeros(n, bool)
    keep = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(i)
        for j in range(i + 1, n):
            if suppressed[j]:
                continue
            yy1 = max(b[i, 0], b[j, 0])
            xx1 = max(b[i, 1], b[j, 1])
            yy2 = min(b[i, 2], b[j, 2])
            xx2 = min(b[i, 3], b[j, 3])
            ih = max(0.0, yy2 - yy1 + add)
            iw = max(0.0, xx2 - xx1 + add)
            inter = ih * iw
            a_i = (b[i, 2] - b[i, 0] + add) * (b[i, 3] - b[i, 1] + add)
            a_j = (b[j, 2] - b[j, 0] + add) * (b[j, 3] - b[j, 1] + add)
            iou = inter / (a_i + a_j - inter)
            hit = iou >= thresh if suppress_at_equal else iou > thresh
            if hit:
                suppressed[j] = True
    return keep


def np_crop_and_resize(image, bxs, box_ind, crop_size, extrapolation_value=0.0):
    """Per-pixel oracle of TF-legacy crop_and_resize (NHWC)."""
    n = len(bxs)
    _, H, W, C = image.shape
    ch, cw = crop_size
    out = np.zeros((n, ch, cw, C), image.dtype)
    for bi in range(n):
        y1, x1, y2, x2 = bxs[bi]
        img = image[box_ind[bi]]
        for y in range(ch):
            in_y = (
                y1 * (H - 1) + y * (y2 - y1) * (H - 1) / (ch - 1)
                if ch > 1
                else 0.5 * (y1 + y2) * (H - 1)
            )
            if in_y < 0 or in_y > H - 1:
                out[bi, y] = extrapolation_value
                continue
            for x in range(cw):
                in_x = (
                    x1 * (W - 1) + x * (x2 - x1) * (W - 1) / (cw - 1)
                    if cw > 1
                    else 0.5 * (x1 + x2) * (W - 1)
                )
                if in_x < 0 or in_x > W - 1:
                    out[bi, y, x] = extrapolation_value
                    continue
                ty, by_ = int(np.floor(in_y)), int(np.ceil(in_y))
                lx, rx = int(np.floor(in_x)), int(np.ceil(in_x))
                yl, xl = in_y - ty, in_x - lx
                top = img[ty, lx] + (img[ty, rx] - img[ty, lx]) * xl
                bot = img[by_, lx] + (img[by_, rx] - img[by_, lx]) * xl
                out[bi, y, x] = top + (bot - top) * yl
    return out


# ------------------------------------------------------------------ boxes ---


def test_apply_box_deltas_roundtrip():
    rng = np.random.RandomState(0)
    b = np.sort(rng.rand(16, 4).astype(np.float32), axis=-1)[:, [0, 2, 1, 3]]
    b = b[:, [0, 2, 1, 3]]  # shuffle into y1<y2, x1<x2 pairs
    b = np.stack([b[:, 0], b[:, 1], b[:, 0] + 0.1 + b[:, 2] * 0.2, b[:, 1] + 0.1 + b[:, 3] * 0.2], 1)
    gt = b + rng.randn(16, 4).astype(np.float32) * 0.02
    gt[:, 2] = np.maximum(gt[:, 2], gt[:, 0] + 0.05)
    gt[:, 3] = np.maximum(gt[:, 3], gt[:, 1] + 0.05)
    deltas = boxes.box_refinement(jnp.asarray(b), jnp.asarray(gt))
    rec = boxes.apply_box_deltas(jnp.asarray(b), deltas)
    np.testing.assert_allclose(np.asarray(rec), gt, atol=1e-5)


def test_box_iou_identity_and_disjoint():
    b = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(boxes.box_iou(b, b))
    np.testing.assert_allclose(iou, np.eye(2), atol=1e-6)


def test_clip_boxes():
    b = jnp.asarray([[-5.0, -5.0, 2000.0, 500.0]])
    out = np.asarray(boxes.clip_boxes(b, (0.0, 0.0, 1024.0, 1024.0)))
    np.testing.assert_array_equal(out, [[0.0, 0.0, 1024.0, 500.0]])


# ---------------------------------------------------------------- anchors ---


def test_anchor_counts_1024():
    from sln_amodal_tpu.config import Config

    cfg = Config()
    a = anchors.config_anchors(cfg)
    expected = 3 * sum(
        (1024 // s) ** 2 for s in (4, 8, 16, 32, 64)
    )
    assert a.shape == (expected, 4)
    assert cfg.num_anchors == expected
    # first anchors are centered at (0,0) with scale-32 boxes
    h = a[:, 2] - a[:, 0]
    w = a[:, 3] - a[:, 1]
    np.testing.assert_allclose((h[0] * w[0]) ** 0.5, 32.0, rtol=1e-5)
    # areas are scale² for square ratio=1 anchors
    assert np.isclose(h[1], 32.0) and np.isclose(w[1], 32.0)


# -------------------------------------------------------------------- nms ---


@pytest.mark.parametrize("plus_one,strict_eq", [(True, False), (False, False), (True, True)])
def test_nms_matches_oracle(plus_one, strict_eq):
    rng = np.random.RandomState(42)
    n = 200
    centers = rng.rand(n, 2) * 100
    sizes = rng.rand(n, 2) * 30 + 2
    b = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1).astype(np.float32)
    b = b[:, [0, 1, 2, 3]]
    scores = np.sort(rng.rand(n).astype(np.float32))[::-1].copy()

    ref = np_greedy_nms(b, 0.5, plus_one=plus_one, suppress_at_equal=strict_eq)
    keep, keep_valid = nms.nms_sorted(
        jnp.asarray(b),
        jnp.ones(n, bool),
        max_outputs=n,
        iou_threshold=0.5,
        plus_one=plus_one,
        suppress_at_equal=strict_eq,
    )
    got = np.asarray(keep)[np.asarray(keep_valid)].tolist()
    assert got == ref


def test_nms_respects_valid_mask_and_padding():
    b = np.array(
        [[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]], dtype=np.float32
    )
    valid = jnp.asarray([True, True, False])
    keep, keep_valid = nms.nms_sorted(jnp.asarray(b), valid, 3, 0.5)
    assert np.asarray(keep_valid).tolist() == [True, False, False]
    assert np.asarray(keep)[0] == 0
    assert np.asarray(keep)[1] == -1


def test_nms_unsorted_wrapper():
    b = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], dtype=np.float32)
    scores = np.array([0.1, 0.9], np.float32)
    keep, keep_valid = nms.nms(jnp.asarray(b), jnp.asarray(scores), 2, 0.5)
    assert np.asarray(keep).tolist() == [1, 0]


# -------------------------------------------------------------- roi_align ---


def test_crop_and_resize_matches_oracle():
    rng = np.random.RandomState(1)
    image = rng.randn(2, 13, 17, 3).astype(np.float32)
    bxs = np.array(
        [
            [0.1, 0.2, 0.7, 0.9],
            [0.0, 0.0, 1.0, 1.0],
            [-0.2, 0.3, 0.5, 1.2],  # exercises extrapolation
            [0.5, 0.5, 0.5, 0.5],   # degenerate box
        ],
        dtype=np.float32,
    )
    box_ind = np.array([0, 1, 0, 1], np.int32)
    got = np.asarray(
        roi_align.crop_and_resize(
            jnp.asarray(image), jnp.asarray(bxs), jnp.asarray(box_ind), (7, 7)
        )
    )
    ref = np_crop_and_resize(image, bxs, box_ind, (7, 7))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_crop_and_resize_single_pixel_crop():
    rng = np.random.RandomState(2)
    image = rng.randn(1, 9, 9, 2).astype(np.float32)
    bxs = np.array([[0.25, 0.25, 0.75, 0.75]], np.float32)
    got = np.asarray(
        roi_align.crop_and_resize(
            jnp.asarray(image), jnp.asarray(bxs), jnp.zeros(1, jnp.int32), (1, 1)
        )
    )
    ref = np_crop_and_resize(image, bxs, np.zeros(1, np.int32), (1, 1))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_crop_and_resize_grad_is_finite_and_correct():
    rng = np.random.RandomState(3)
    image = rng.randn(1, 8, 8, 1).astype(np.float32)
    bxs = jnp.asarray([[0.1, 0.1, 0.9, 0.9]], jnp.float32)

    def f(img):
        return jnp.sum(
            roi_align.crop_and_resize(img, bxs, jnp.zeros(1, jnp.int32), (4, 4)) ** 2
        )

    g = jax.grad(f)(jnp.asarray(image))
    assert np.all(np.isfinite(np.asarray(g)))
    # numeric check on one element
    eps = 1e-3
    e = np.zeros_like(image)
    e[0, 3, 3, 0] = eps
    fd = (f(jnp.asarray(image + e)) - f(jnp.asarray(image - e))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g)[0, 3, 3, 0], np.asarray(fd), rtol=1e-2, atol=1e-3)


def test_roi_levels_rule():
    # normalized box of 224/1024 side on a 1024² image → level 4
    s = 224.0 / 1024.0
    b = jnp.asarray(
        [
            [0.0, 0.0, s, s],
            [0.0, 0.0, 2 * s, 2 * s],   # → 5
            [0.0, 0.0, s / 2, s / 2],   # → 3
            [0.0, 0.0, s / 8, s / 8],   # → 1 → clamp 2
            [0.0, 0.0, 1.0, 1.0],       # big → clamp 5
        ]
    )
    lv = np.asarray(roi_align.roi_levels(b, 1024.0 * 1024.0))
    assert lv.tolist() == [4, 5, 3, 2, 5]


def test_pyramid_roi_align_matches_single_level_crop():
    """Boxes forced to one level must equal plain crop_and_resize there."""
    rng = np.random.RandomState(4)
    image_shape = (1024, 1024)
    feats = [
        rng.randn(256, 256, 8).astype(np.float32),
        rng.randn(128, 128, 8).astype(np.float32),
        rng.randn(64, 64, 8).astype(np.float32),
        rng.randn(32, 32, 8).astype(np.float32),
    ]
    s = 224.0 / 1024.0  # level-4 sized boxes
    bxs = np.array([[0.1, 0.1, 0.1 + s, 0.1 + s], [0.4, 0.3, 0.4 + s, 0.3 + s]], np.float32)
    got = np.asarray(
        roi_align.pyramid_roi_align(
            [jnp.asarray(f) for f in feats], jnp.asarray(bxs), (7, 7), image_shape
        )
    )
    ref = np.asarray(
        roi_align.crop_and_resize(
            jnp.asarray(feats[2])[None], jnp.asarray(bxs), jnp.zeros(2, jnp.int32), (7, 7)
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pyramid_roi_align_mixed_levels():
    rng = np.random.RandomState(5)
    image_shape = (1024, 1024)
    feats = [
        rng.randn(256, 256, 4).astype(np.float32),
        rng.randn(128, 128, 4).astype(np.float32),
        rng.randn(64, 64, 4).astype(np.float32),
        rng.randn(32, 32, 4).astype(np.float32),
    ]
    small = 224.0 / 1024.0 / 4  # level 2
    big = 448.0 / 1024.0        # level 5
    bxs = np.array(
        [[0.1, 0.1, 0.1 + small, 0.1 + small], [0.2, 0.2, 0.2 + big, 0.2 + big]],
        np.float32,
    )
    got = np.asarray(
        roi_align.pyramid_roi_align(
            [jnp.asarray(f) for f in feats], jnp.asarray(bxs), (7, 7), image_shape
        )
    )
    ref0 = np_crop_and_resize(feats[0][None], bxs[:1], np.zeros(1, np.int32), (7, 7))
    ref1 = np_crop_and_resize(feats[3][None], bxs[1:], np.zeros(1, np.int32), (7, 7))
    np.testing.assert_allclose(got[0], ref0[0], atol=1e-4)
    np.testing.assert_allclose(got[1], ref1[0], atol=1e-4)
