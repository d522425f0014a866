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
