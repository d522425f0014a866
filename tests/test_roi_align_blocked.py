"""The footprint-blocked gather forms of crop_and_resize /
pyramid_roi_align must be BIT-IDENTICAL to the row-gather forms: same
corner values (incl. integral coordinates, boxes at/over the image edge,
inverted and degenerate boxes) and the same lerp arithmetic order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sln_amodal_tpu.ops.roi_align import (
    crop_and_resize,
    crop_and_resize_blocked,
    pyramid_roi_align_gather_batched,
    pyramid_roi_align_gather_batched_blocked,
)


def _boxes_with_edges(rng, n):
    """Random boxes plus every pathological layout."""
    boxes = rng.uniform(-0.2, 1.2, (n, 4)).astype(np.float32)
    y1x1 = np.minimum(boxes[:, :2], boxes[:, 2:])
    y2x2 = np.maximum(boxes[:, :2], boxes[:, 2:])
    boxes = np.concatenate([y1x1, y2x2], 1)
    special = np.array(
        [
            [0.0, 0.0, 1.0, 1.0],      # full frame (integral corner coords)
            [0.0, 0.0, 0.0, 0.0],      # degenerate point at origin
            [1.0, 1.0, 1.0, 1.0],      # degenerate point at far corner
            [0.5, 0.5, 0.5, 0.5],      # degenerate interior point
            [-0.5, -0.5, 0.2, 0.2],    # hangs off top-left
            [0.8, 0.8, 1.5, 1.5],      # hangs off bottom-right
            [0.25, 0.25, 0.75, 0.75],  # exact quarter-pixel alignment
            [0.9999, 0.0, 1.0001, 1.0],  # razor-thin at the far edge
        ],
        np.float32,
    )
    return np.concatenate([boxes, special])


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("crop", [(7, 7), (16, 16), (1, 1), (3, 5)])
def test_crop_and_resize_blocked_bit_identical(dtype, crop):
    rng = np.random.RandomState(0)
    # C >= _BLOCKED_MIN_CHANNELS so the blocked gather path itself runs
    # (narrow channels dispatch to the row-gather fallback — tested below)
    img = jnp.asarray(rng.randn(3, 21, 17, 32).astype(np.float32)).astype(dtype)
    boxes = jnp.asarray(_boxes_with_edges(rng, 40))
    bi = jnp.asarray(rng.randint(0, 3, (boxes.shape[0],)).astype(np.int32))
    a = crop_and_resize(img, boxes, bi, crop, extrapolation_value=-7.0)
    b = crop_and_resize_blocked(img, boxes, bi, crop, extrapolation_value=-7.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_crop_and_resize_blocked_tiny_image_falls_back():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(1, 1, 4, 2).astype(np.float32))
    boxes = jnp.asarray([[0.0, 0.0, 1.0, 1.0]], jnp.float32)
    bi = jnp.zeros((1,), jnp.int32)
    a = crop_and_resize(img, boxes, bi, (2, 2))
    b = crop_and_resize_blocked(img, boxes, bi, (2, 2))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_blocked_narrow_channels_take_row_gather(monkeypatch):
    """Narrow-channel inputs (the C=1 GT-mask crop, the C=3/C=1 refine-head
    crops) must NOT reach the (1,2,2,C)-slice gather — XLA lowers it to a
    serial while loop on large tables (measured 228 ms inside the train
    step). The dispatch is static, so we assert the block gather is never
    invoked."""
    import sln_amodal_tpu.ops.roi_align as ra

    def boom(*a, **k):
        raise AssertionError("blocked gather used for narrow channels")

    monkeypatch.setattr(ra, "_gather_blocks", boom)
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.randn(2, 33, 29, 1).astype(np.float32))
    boxes = jnp.asarray(_boxes_with_edges(rng, 10))
    bi = jnp.asarray(rng.randint(0, 2, (boxes.shape[0],)).astype(np.int32))
    a = ra.crop_and_resize(img, boxes, bi, (5, 5))
    b = ra.crop_and_resize_blocked(img, boxes, bi, (5, 5))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    feats = tuple(
        jnp.asarray(rng.randn(2, 16 // s, 16 // s, 4).astype(np.float32))
        for s in (1, 2, 4, 8)
    )
    bb = jnp.asarray(np.stack([_boxes_with_edges(rng, 6)[:8]] * 2))
    a = ra.pyramid_roi_align_gather_batched(feats, bb, (3, 3), (16, 16))
    b = ra.pyramid_roi_align_gather_batched_blocked(feats, bb, (3, 3), (16, 16))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pyramid_blocked_tiny_level_falls_back(monkeypatch):
    """A pyramid whose coarsest level is 1x1 (image_size < 64) must fall back
    to the row-gather form: the blocked y0/x0 clamp to (dim-2) would go
    negative and the 2x2 slice would cross into a neighbouring level."""
    import sln_amodal_tpu.ops.roi_align as ra

    def boom(*a, **k):
        raise AssertionError("blocked gather used with a <2-sized level")

    monkeypatch.setattr(ra, "_gather_blocks", boom)
    rng = np.random.RandomState(5)
    size = 32  # P5 = 32/32 = 1x1
    feats = tuple(
        jnp.asarray(rng.randn(1, max(size // s, 1), max(size // s, 1), 64)
                    .astype(np.float32))
        for s in (4, 8, 16, 32)
    )
    boxes = jnp.asarray(_boxes_with_edges(rng, 12)[None])
    a = ra.pyramid_roi_align_gather_batched(feats, boxes, (7, 7), (size, size))
    b = ra.pyramid_roi_align_gather_batched_blocked(
        feats, boxes, (7, 7), (size, size))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("crop", [(7, 7), (16, 16)])
def test_pyramid_batched_blocked_bit_identical(dtype, crop):
    rng = np.random.RandomState(2)
    size = 64
    feats = tuple(
        jnp.asarray(rng.randn(2, size // s, size // s, 32).astype(np.float32))
        .astype(dtype)
        for s in (4, 8, 16, 32)
    )
    boxes = np.stack([_boxes_with_edges(rng, 24), _boxes_with_edges(rng, 24)])
    boxes = jnp.asarray(boxes)
    a = pyramid_roi_align_gather_batched(feats, boxes, crop, (size, size))
    b = pyramid_roi_align_gather_batched_blocked(
        feats, boxes, crop, (size, size))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pyramid_batched_blocked_under_jit_and_grad():
    """The blocked form must trace under jit and be differentiable (its
    consumers wrap it in the einsum custom-VJP, but the raw op should not
    trap autodiff either)."""
    rng = np.random.RandomState(3)
    size = 64
    feats = tuple(
        jnp.asarray(rng.randn(1, size // s, size // s, 32).astype(np.float32))
        for s in (4, 8, 16, 32)
    )
    boxes = jnp.asarray(rng.uniform(0.1, 0.9, (1, 6, 4)).astype(np.float32))
    boxes = jnp.concatenate(
        [jnp.minimum(boxes[..., :2], boxes[..., 2:]),
         jnp.maximum(boxes[..., :2], boxes[..., 2:])], -1)

    def f(fs):
        return jnp.sum(pyramid_roi_align_gather_batched_blocked(
            fs, boxes, (7, 7), (size, size)))

    g_blocked = jax.jit(jax.grad(f))(feats)

    def f_ref(fs):
        return jnp.sum(pyramid_roi_align_gather_batched(
            fs, boxes, (7, 7), (size, size)))

    g_ref = jax.grad(f_ref)(feats)
    # scatter-add ORDER differs between the two raw-autodiff transposes, so
    # agreement is to f32 rounding, not bit-exact (production wraps both in
    # the custom-VJP einsum backward anyway)
    for gb, gr in zip(g_blocked, g_ref):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gr),
                                   rtol=1e-5, atol=1e-5)
