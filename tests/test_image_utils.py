"""Host-side image molding/unmolding tests (the scipy.misc quirks)."""

import numpy as np

from sln_amodal_tpu.config import Config
from sln_amodal_tpu.utils import image as im


def test_bytescale_min_max_rescale():
    data = np.array([[0.2, 0.4], [0.6, 0.2]])
    out = im.bytescale(data)
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255
    # mid value 0.4 → (0.4-0.2)/0.4*255 = 127.5 → +0.5 → 128
    assert out[0, 1] == 128


def test_bytescale_constant_input():
    out = im.bytescale(np.full((3, 3), 0.7))
    assert (out == 0).all()


def test_unmold_mask_relative_threshold():
    """The bytescale path makes 0.5 a *relative* threshold."""
    mask = np.full((4, 4), 0.3)
    mask[1:3, 1:3] = 0.31  # max; rescaled to 255 → above threshold
    full = im.unmold_mask(mask, (0, 0, 4, 4), (8, 8))
    assert full[1, 1] == 1
    assert full[0, 0] == 0


def test_mold_roundtrip():
    cfg = Config(image_size=64)
    img = np.random.RandomState(0).randint(0, 255, (32, 48, 3), np.uint8)
    molded, windows = im.mold_inputs([img], cfg)
    # uint8 resized frames: the mean subtraction happens on device
    # (uint8 -> f32 is exact, so this is bit-identical to host molding)
    assert molded.shape == (1, 64, 64, 3)
    assert molded.dtype == np.uint8
    assert windows[0].tolist() == [0, 0, 64, 64]
    floated = im.mold_image(molded[0], cfg.mean_pixel)
    rec = im.unmold_image(floated, cfg.mean_pixel)
    assert rec.dtype == np.uint8
    np.testing.assert_array_equal(rec, molded[0])


def test_image_meta_contract():
    """compose/parse round-trip — the reference's meta array format
    (model.py:709-727), kept as a standalone contract helper."""
    meta = im.compose_image_meta(7, (32, 48, 3), (0, 0, 64, 64), [0, 1])
    ids, shapes, win, active = im.parse_image_meta(meta[None])
    assert ids[0] == 7
    assert shapes[0].tolist() == [32, 48, 3]
    assert win[0].tolist() == [0, 0, 64, 64]
    assert active[0].tolist() == [0, 1]


def test_unmold_detections_trims_and_rescales():
    det = np.zeros((5, 6), np.float32)
    det[0] = [10, 10, 30, 30, 1, 0.9]
    det[1] = [40, 40, 60, 60, 1, 0.8]
    # row 2 zero → cutoff
    masks = np.zeros((5, 32, 32, 2), np.float32)
    # non-constant: a constant mask bytescales to all-zero (reference quirk,
    # covered by test_unmold_constant_mask_is_empty)
    masks[:2, 4:28, 4:28, 1] = 1.0
    boxes, class_ids, scores, full = im.unmold_detections(
        det, masks, (128, 128, 3), (0, 0, 64, 64)
    )
    assert len(scores) == 2
    # window 64 → image 128: boxes doubled
    np.testing.assert_array_equal(boxes[0], [20, 20, 60, 60])
    assert full.shape == (128, 128, 2)
    assert full[:, :, 0].sum() > 0


def test_unmold_constant_mask_is_empty():
    """scipy.misc.imresize bytescaled by data min/max: a constant mask maps
    to all-zero — faithful to the reference unmold path (utils.py:458-459)."""
    full = im.unmold_mask(np.full((8, 8), 0.9), (0, 0, 8, 8), (16, 16))
    assert full.sum() == 0


def test_unmold_detections_drops_zero_area():
    det = np.zeros((2, 6), np.float32)
    det[0] = [10, 10, 10, 30, 1, 0.9]   # zero-height box
    det[1] = [40, 40, 60, 60, 1, 0.8]
    masks = np.ones((2, 32, 32, 2), np.float32)
    boxes, class_ids, scores, full = im.unmold_detections(
        det, masks, (64, 64, 3), (0, 0, 64, 64)
    )
    assert len(scores) == 1
    assert scores[0] == np.float32(0.8)


def test_pil_same_size_resize_is_identity():
    """The scale-1 fast path in pil_resize_uint8 must be exactly what PIL
    produces: bilinear at scale 1 is an identity."""
    from PIL import Image

    rng = np.random.RandomState(0)
    a = rng.randint(0, 256, (57, 43, 3), np.uint8)
    direct = np.asarray(Image.fromarray(a).resize((43, 57), Image.BILINEAR))
    np.testing.assert_array_equal(direct, a)
    np.testing.assert_array_equal(im.pil_resize_uint8(a, (57, 43)), a)
