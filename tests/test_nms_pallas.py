"""Pallas NMS kernel vs the XLA reference implementation (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sln_amodal_tpu.ops.nms import nms_sorted
from sln_amodal_tpu.ops.nms_pallas import nms_sorted_pallas


def random_boxes(rng, n, spread=200.0, size=40.0):
    centers = rng.rand(n, 2) * spread
    sizes = rng.rand(n, 2) * size + 2
    return np.concatenate([centers - sizes / 2, centers + sizes / 2], 1).astype(
        np.float32
    )


@pytest.mark.parametrize("n,thr", [(64, 0.5), (300, 0.5), (300, 0.7), (513, 0.3)])
def test_pallas_matches_xla(n, thr):
    rng = np.random.RandomState(n)
    b = random_boxes(rng, n)
    valid = jnp.ones((n,), bool)
    k_ref, v_ref = nms_sorted(jnp.asarray(b), valid, max_outputs=n, iou_threshold=thr)
    k_pal, v_pal = nms_sorted_pallas(
        jnp.asarray(b), valid, max_outputs=n, iou_threshold=thr, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_pal))
    np.testing.assert_array_equal(np.asarray(k_ref), np.asarray(k_pal))


def test_pallas_respects_valid_and_max_outputs():
    rng = np.random.RandomState(0)
    b = random_boxes(rng, 200, spread=1000.0)   # mostly disjoint
    valid = jnp.asarray(rng.rand(200) > 0.3)
    k_ref, v_ref = nms_sorted(jnp.asarray(b), valid, 50, 0.5)
    k_pal, v_pal = nms_sorted_pallas(jnp.asarray(b), valid, 50, 0.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_pal))
    np.testing.assert_array_equal(np.asarray(k_ref), np.asarray(k_pal))


def test_pallas_dense_cluster_chains():
    """Heavily overlapping boxes exercise long suppression chains."""
    rng = np.random.RandomState(7)
    base = np.array([50, 50, 90, 90], np.float32)
    jit = rng.randn(256, 4).astype(np.float32) * 6
    b = base[None] + jit
    b[:, 2:] = np.maximum(b[:, 2:], b[:, :2] + 1)
    valid = jnp.ones((256,), bool)
    k_ref, v_ref = nms_sorted(jnp.asarray(b), valid, 256, 0.5)
    k_pal, v_pal = nms_sorted_pallas(jnp.asarray(b), valid, 256, 0.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(k_ref), np.asarray(k_pal))


def test_pallas_multiblock_cross_suppression():
    """n > 2048 exercises the blocked cross-tile pass (multiple CROSS
    blocks + padded tail) — the production 6000-box shape class."""
    rng = np.random.RandomState(11)
    b = random_boxes(rng, 2500, spread=400.0, size=60.0)
    valid = jnp.ones((2500,), bool)
    k_ref, v_ref = nms_sorted(jnp.asarray(b), valid, 1000, 0.7)
    k_pal, v_pal = nms_sorted_pallas(jnp.asarray(b), valid, 1000, 0.7,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_pal))
    np.testing.assert_array_equal(np.asarray(k_ref), np.asarray(k_pal))


def test_pallas_batched_matches_per_image():
    """The batch-grid kernel must equal the per-image XLA reference row for
    row — distinct box sets, mixed validity, and a non-tile-aligned n
    (padding per image). Also proves scratch reuse across grid steps never
    leaks one image's aliveness into the next (image 0 is a dense cluster
    whose survivors differ wildly from image 1's disjoint field)."""
    from sln_amodal_tpu.ops.nms_pallas import nms_sorted_pallas_batched

    rng = np.random.RandomState(3)
    n, batch = 513, 4
    boxes = np.stack([random_boxes(rng, n, spread=150.0 * (i + 1))
                      for i in range(batch)])
    # image 0: one dense cluster (long suppression chains)
    boxes[0] = np.array([50, 50, 90, 90], np.float32)[None] \
        + rng.randn(n, 4).astype(np.float32) * 5
    boxes[0, :, 2:] = np.maximum(boxes[0, :, 2:], boxes[0, :, :2] + 1)
    valid = rng.rand(batch, n) > 0.2
    valid[1] = True

    k_b, v_b = nms_sorted_pallas_batched(
        jnp.asarray(boxes), jnp.asarray(valid), max_outputs=100,
        iou_threshold=0.5, interpret=True)
    assert k_b.shape == (batch, 100) and v_b.shape == (batch, 100)
    for i in range(batch):
        k_ref, v_ref = nms_sorted(
            jnp.asarray(boxes[i]), jnp.asarray(valid[i]), 100, 0.5)
        np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_b[i]),
                                      err_msg=f"image {i}")
        np.testing.assert_array_equal(np.asarray(k_ref), np.asarray(k_b[i]),
                                      err_msg=f"image {i}")


def test_pallas_single_is_batched_slice():
    """nms_sorted_pallas (the per-image API) is the b=1 slice of the
    batched kernel — same outputs as the XLA reference (regression for the
    delegation refactor)."""
    rng = np.random.RandomState(5)
    b = random_boxes(rng, 300)
    valid = jnp.asarray(rng.rand(300) > 0.1)
    k_ref, v_ref = nms_sorted(jnp.asarray(b), valid, 64, 0.6)
    k_pal, v_pal = nms_sorted_pallas(jnp.asarray(b), valid, 64, 0.6,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_pal))
    np.testing.assert_array_equal(np.asarray(k_ref), np.asarray(k_pal))


def test_proposal_layer_batched_matches_per_image():
    """proposal_layer_batched ≡ vmap of the per-image proposal_layer
    (batched top_k / take_along_axis gathers / broadcast box math / batched
    NMS vs their per-image forms), on the XLA NMS path."""
    from sln_amodal_tpu.detect.proposal import (
        proposal_layer, proposal_layer_batched)

    rng = np.random.RandomState(9)
    batch, a = 3, 800
    anchors = jnp.asarray(random_boxes(rng, a, spread=900.0, size=80.0))
    probs = jax.nn.softmax(
        jnp.asarray(rng.randn(batch, a, 2).astype(np.float32)), axis=-1)
    deltas = jnp.asarray(rng.randn(batch, a, 4).astype(np.float32) * 0.2)
    kw = dict(proposal_count=60, nms_threshold=0.7, image_size=1024,
              rpn_bbox_std_dev=(0.1, 0.1, 0.2, 0.2), pre_nms_limit=256,
              nms_impl="xla")

    rois_b, valid_b = proposal_layer_batched(probs, deltas, anchors, **kw)
    assert rois_b.shape == (batch, 60, 4)
    for i in range(batch):
        rois_i, valid_i = proposal_layer(probs[i], deltas[i], anchors, **kw)
        np.testing.assert_array_equal(np.asarray(valid_i),
                                      np.asarray(valid_b[i]))
        np.testing.assert_allclose(np.asarray(rois_i),
                                   np.asarray(rois_b[i]), rtol=0, atol=0)


def test_padded_n_layout_constraints():
    """_padded_n must satisfy the Mosaic block constraint (tiles % 8 == 0
    when batched) AND the equal-cross-block split (tiles % ceil(tiles/16)
    == 0) for every n — the tiny-config batched shape (512 boxes -> 4
    tiles) crashed the TPU lowering before the joint search."""
    from sln_amodal_tpu.ops.nms_pallas import TILE, _padded_n

    for n in list(range(1, 1300, 37)) + [512, 6000, 6016, 8192, 20000]:
        for batched in (False, True):
            n_pad = _padded_n(n, batched=batched)
            tiles = n_pad // TILE
            assert n_pad >= n and n_pad % TILE == 0
            if batched:
                assert tiles % 8 == 0, (n, n_pad)
            if tiles > 16:
                assert tiles % (-(-tiles // 16)) == 0, (n, n_pad)
    # production shape unchanged by the fix
    assert _padded_n(6000, batched=True) == 6144


def test_pallas_batched_small_n_matches_xla():
    """Batched kernel at a small, non-multiple-of-8-tiles n (the shape that
    crashed on TPU) is still bit-identical to the XLA loop per image."""
    rng = np.random.RandomState(3)
    b = random_boxes(rng, 512)
    boxes = jnp.stack([jnp.asarray(b), jnp.asarray(b[::-1].copy())])
    valid = jnp.ones((2, 512), bool)
    from sln_amodal_tpu.ops.nms_pallas import nms_sorted_pallas_batched

    k_b, v_b = nms_sorted_pallas_batched(
        boxes, valid, max_outputs=128, iou_threshold=0.7, interpret=True)
    for i in range(2):
        k_x, v_x = nms_sorted(boxes[i], valid[i], max_outputs=128,
                              iou_threshold=0.7)
        np.testing.assert_array_equal(np.asarray(k_b[i]), np.asarray(k_x))
        np.testing.assert_array_equal(np.asarray(v_b[i]), np.asarray(v_x))
