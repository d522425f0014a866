"""Measure the patch-DMA RoIAlign kernel and the dense GLM crop vs the
blocked-gather production paths, at the production shapes.

Run from the repo root on the real TPU:
``python scripts/profile_roipatch.py [batch]``.

Decision gate (COMPONENTS.md "the gather ceiling"): the XLA gather runs at
~55 GB/s regardless of slice size; the patch kernel's [32, 32, C] strided
DMAs must beat that by enough to cover their ~5x byte inflation on the 7x7
pool (the 16x16 pools fetch the same bytes either way, so any rate
improvement is pure win there).
"""
import sys

sys.path.insert(0, ".")

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8

import jax
import jax.numpy as jnp
import numpy as np

from sln_amodal_tpu.utils.runtime import setup_runtime

setup_runtime()

from sln_amodal_tpu.ops.roi_align import (
    crop_and_resize_blocked,
    crop_and_resize_dense_batched,
    pyramid_roi_align_gather_batched_blocked,
)
from sln_amodal_tpu.ops.roi_patch_pallas import pyramid_roi_align_patch
from sln_amodal_tpu.utils.benchmark import loop_time

C = 256
SHAPES = [(256, 256), (128, 128), (64, 64), (32, 32)]
IMAGE = (1024, 1024)

rng = np.random.RandomState(0)
feats = tuple(
    jnp.asarray(rng.randn(BATCH, h, w, C).astype(np.float32)).astype(
        jnp.bfloat16)
    for (h, w) in SHAPES
)


def boxes_like_proposals(n, seed=1):
    """Moderate-aspect boxes (aspect <= ~1.8, like NMS'd proposals); the
    spill path handles the elongated tail, pinned by tests."""
    r = np.random.RandomState(seed)
    y1 = r.uniform(0, 0.95, (BATCH, n))
    x1 = r.uniform(0, 0.95, (BATCH, n))
    s = r.uniform(0.005, 0.4, (BATCH, n))
    h = np.minimum(s * r.uniform(0.75, 1.33, (BATCH, n)), 1 - y1)
    w = np.minimum(s * r.uniform(0.75, 1.33, (BATCH, n)), 1 - x1)
    return jnp.asarray(np.stack([y1, x1, y1 + h, x1 + w], -1), jnp.float32)


def report(tag, dt, n_rois, pool):
    per_img = dt / BATCH * 1e3
    print(f"{tag:34s} {dt * 1e3:8.3f} ms/batch  {per_img:7.3f} ms/img "
          f"({n_rois} rois @ {pool}x{pool})", flush=True)


for pool, n in ((7, 1000), (16, 100)):
    boxes = boxes_like_proposals(n)
    dt_blk = loop_time(
        lambda f, b: pyramid_roi_align_gather_batched_blocked(
            f, b, (pool, pool), IMAGE),
        feats, (boxes,), iters=20)
    report(f"blocked-gather pool={pool}", dt_blk, n, pool)
    for group in (2, 4, 8):
        dt_pat = loop_time(
            lambda f, b, g=group: pyramid_roi_align_patch(
                f, b, (pool, pool), IMAGE, group=g),
            feats, (boxes,), iters=20)
        report(f"patch-DMA pool={pool} group={group}", dt_pat, n, pool)

# GLM-prior crop: [B, 65, 65, 184] table, 100 boxes/img @ 16x16
prior = jnp.asarray(
    rng.randn(BATCH, 65, 65, 184).astype(np.float32)).astype(jnp.bfloat16)
gboxes = boxes_like_proposals(100, seed=2)
bi = jnp.repeat(jnp.arange(BATCH, dtype=jnp.int32), 100)
dt = loop_time(
    lambda p, b: crop_and_resize_blocked(
        p, b.reshape(-1, 4), bi, (16, 16)),
    prior, (gboxes,), iters=20)
report("glm crop blocked-gather", dt, 100, 16)
dt = loop_time(
    lambda p, b: crop_and_resize_dense_batched(p, b, (16, 16)),
    prior, (gboxes,), iters=20)
report("glm crop dense-einsum", dt, 100, 16)
