"""Dense separable-einsum crop vs the gather crop_and_resize oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from sln_amodal_tpu.ops.roi_align import (
    crop_and_resize,
    crop_and_resize_dense_batched,
)


def _case(b, n, h, w, c, seed):
    rng = np.random.RandomState(seed)
    image = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    y1 = rng.uniform(-0.2, 1.0, (b, n))
    x1 = rng.uniform(-0.2, 1.0, (b, n))
    hh = rng.uniform(0.0, 0.8, (b, n))
    ww = rng.uniform(0.0, 0.8, (b, n))
    boxes = np.stack([y1, x1, y1 + hh, x1 + ww], axis=-1).astype(np.float32)
    boxes[:, 0] = [0.0, 0.0, 1.0, 1.0]        # full-table crop
    boxes[:, 1] = [-0.5, -0.5, 1.5, 1.5]      # extrapolation region
    return image, jnp.asarray(boxes)


@pytest.mark.parametrize("crop", [(16, 16), (7, 7), (1, 1)])
def test_matches_gather_oracle(crop):
    b, n = 2, 9
    image, boxes = _case(b, n, 65, 65, 12, seed=0)
    bi = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    ref = crop_and_resize(image, boxes.reshape(b * n, 4), bi, crop)
    out = crop_and_resize_dense_batched(image, boxes, crop)
    np.testing.assert_allclose(
        np.asarray(out).reshape(b * n, *crop, 12), np.asarray(ref),
        rtol=1e-5, atol=1e-5)


def test_pixel_coord_quirk_boxes_zero():
    """The reference's pixel-coords quirk feeds huge 'normalized' boxes;
    every sample is out of range -> exact-zero crops on both paths."""
    rng = np.random.RandomState(1)
    image = jnp.asarray(rng.randn(1, 33, 33, 4).astype(np.float32))
    boxes = jnp.asarray([[[100.0, 200.0, 400.0, 500.0]]], jnp.float32)
    out = crop_and_resize_dense_batched(image, boxes, (16, 16))
    np.testing.assert_array_equal(np.asarray(out), 0.0)
