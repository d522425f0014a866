"""Patch-DMA RoIAlign kernel vs the gather reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sln_amodal_tpu.ops.roi_align import pyramid_roi_align_gather_batched
from sln_amodal_tpu.ops.roi_patch_pallas import PATCH, pyramid_roi_align_patch

IMAGE = (256, 256)


def _feats(b, c, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    return tuple(
        jnp.asarray(rng.randn(b, s, s, c).astype(np.float32), dtype=dtype)
        for s in (64, 32)
    )


def _boxes(b, n, seed=1, include_edge=True):
    rng = np.random.RandomState(seed)
    y1 = rng.uniform(-0.1, 0.9, (b, n))
    x1 = rng.uniform(-0.1, 0.9, (b, n))
    h = rng.uniform(0.01, 0.5, (b, n))
    w = rng.uniform(0.01, 0.5, (b, n))
    boxes = np.stack([y1, x1, y1 + h, x1 + w], axis=-1).astype(np.float32)
    if include_edge:
        boxes[:, 0] = [0.0, 0.0, 1.0, 1.0]          # full image
        boxes[:, 1] = [0.0, 0.0, 0.001, 0.001]      # tiny corner box
        boxes[:, 2] = [0.5, 0.5, 0.5, 0.9]          # zero-height line
    return jnp.asarray(boxes)


@pytest.mark.parametrize("pool", [7, 16])
def test_matches_gather_reference(pool):
    feats = _feats(b=2, c=8)
    boxes = _boxes(b=2, n=12)
    ref = pyramid_roi_align_gather_batched(feats, boxes, (pool, pool), IMAGE)
    out = pyramid_roi_align_patch(
        feats, boxes, (pool, pool), IMAGE, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_spill_path_elongated_boxes():
    """Aspect-ratio outliers overflow the patch and take the spill path."""
    feats = _feats(b=1, c=8, seed=3)
    rng = np.random.RandomState(4)
    n = 8
    y1 = rng.uniform(0.0, 0.3, (1, n))
    x1 = rng.uniform(0.0, 0.3, (1, n))
    # extreme aspect: tall thin boxes whose level-rule assignment makes the
    # y-span exceed PATCH-1 cells
    boxes = np.stack(
        [y1, x1, y1 + 0.65, x1 + 0.02], axis=-1).astype(np.float32)
    boxes = jnp.asarray(boxes)
    ref = pyramid_roi_align_gather_batched(feats, boxes, (7, 7), IMAGE)
    out = pyramid_roi_align_patch(feats, boxes, (7, 7), IMAGE, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_spill_overflow_falls_back_whole_call():
    """More misfits than spill slots -> the lax.cond slow path (blocked
    gather) keeps the result exact."""
    feats = _feats(b=1, c=8, seed=5)
    rng = np.random.RandomState(6)
    n = 8
    y1 = rng.uniform(0.0, 0.25, (1, n))
    x1 = rng.uniform(0.0, 0.25, (1, n))
    boxes = jnp.asarray(np.stack(
        [y1, x1, y1 + 0.7, x1 + 0.02], axis=-1).astype(np.float32))
    ref = pyramid_roi_align_gather_batched(feats, boxes, (7, 7), IMAGE)
    out = pyramid_roi_align_patch(
        feats, boxes, (7, 7), IMAGE, interpret=True, spill_slots=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_inverted_boxes_route_to_spill():
    feats = _feats(b=1, c=8, seed=7)
    boxes = jnp.asarray(
        np.array([[[0.6, 0.2, 0.2, 0.6],      # y2 < y1
                   [0.2, 0.6, 0.6, 0.2],      # x2 < x1
                   [0.2, 0.2, 0.6, 0.6],
                   [0.3, 0.3, 0.4, 0.4]]], np.float32))
    ref = pyramid_roi_align_gather_batched(feats, boxes, (7, 7), IMAGE)
    out = pyramid_roi_align_patch(feats, boxes, (7, 7), IMAGE, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_small_level_falls_back():
    """A level smaller than PATCH bypasses the kernel entirely."""
    rng = np.random.RandomState(8)
    feats = tuple(
        jnp.asarray(rng.randn(1, s, s, 8).astype(np.float32))
        for s in (32, 16)
    )
    boxes = _boxes(b=1, n=4, seed=9)
    ref = pyramid_roi_align_gather_batched(feats, boxes, (7, 7), IMAGE)
    out = pyramid_roi_align_patch(feats, boxes, (7, 7), IMAGE, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_group_padding():
    """N not divisible by the DMA group size pads cleanly."""
    feats = _feats(b=1, c=8, seed=10)
    boxes = _boxes(b=1, n=5, seed=11, include_edge=False)
    ref = pyramid_roi_align_gather_batched(feats, boxes, (7, 7), IMAGE)
    out = pyramid_roi_align_patch(
        feats, boxes, (7, 7), IMAGE, interpret=True, group=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
