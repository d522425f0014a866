"""A/B: row-gather vs footprint-blocked gather for the ROI crops at the
b8 production shapes (see scripts/profile_roihead.py for the motivating
split: the 4-corner row gathers cost ~10 ns/index and dominate the
classifier/mask stages).

Run from the repo root on the real TPU:
``python scripts/profile_gather.py [batch]``.
"""
import sys

sys.path.insert(0, ".")

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8

import jax
import jax.numpy as jnp
import numpy as np

from sln_amodal_tpu.utils.runtime import setup_runtime

setup_runtime()

from sln_amodal_tpu.config import inference_config
from sln_amodal_tpu.ops.roi_align import (
    crop_and_resize,
    crop_and_resize_blocked,
    pyramid_roi_align_gather_batched,
    pyramid_roi_align_gather_batched_blocked,
)
from sln_amodal_tpu.utils.benchmark import loop_time

config = inference_config(compute_dtype="bfloat16")
DT = jnp.bfloat16
rng = np.random.RandomState(0)
cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]


def put(a, dtype=DT):
    with jax.default_device(cpu):
        h = jnp.asarray(a).astype(dtype)
    return jax.device_put(h, dev)


s = config.image_size
feat_shapes = [(s // 4, s // 4), (s // 8, s // 8), (s // 16, s // 16),
               (s // 32, s // 32)]
feats = tuple(
    put(rng.randn(BATCH, h, w, config.fpn_channels).astype(np.float32))
    for h, w in feat_shapes)


def rand_boxes(n):
    c = rng.rand(BATCH, n, 2)
    span = np.exp(rng.uniform(np.log(0.01), np.log(0.6), (BATCH, n, 2)))
    y1x1 = np.clip(c - span / 2, 0, 1)
    y2x2 = np.clip(c + span / 2, 0, 1)
    return np.concatenate([y1x1, y2x2], -1).astype(np.float32)


cls_boxes = put(rand_boxes(config.post_nms_rois_inference), jnp.float32)
det_boxes = put(rand_boxes(config.detection_max_instances), jnp.float32)
m = config.mask_pool_size
N = 20


def report(name, dt):
    print(f"{name:22s} {dt * 1e3:8.3f} ms/batch ({dt / BATCH * 1e3:7.3f} ms/img)",
          flush=True)


for name, fn in (("row-gather", pyramid_roi_align_gather_batched),
                 ("blocked", pyramid_roi_align_gather_batched_blocked)):
    dt = loop_time(
        lambda b, f, fn=fn: fn(
            f, b, (config.pool_size, config.pool_size), (s, s)),
        cls_boxes, (feats,), iters=N)
    report(f"cls-roialign/{name}", dt)
    dt = loop_time(
        lambda b, f, fn=fn: fn(f, b, (m, m), (s, s)),
        det_boxes, (feats,), iters=N)
    report(f"mask-roialign/{name}", dt)

g = (config.glm_input_size - 1) // 8 + 1
prior = put(rng.randn(BATCH, g, g, config.glm_num_classes + 1)
            .astype(np.float32))
nb = config.detection_max_instances
bi = put(np.repeat(np.arange(BATCH, dtype=np.int32), nb), jnp.int32)
for name, fn in (("row-gather", crop_and_resize),
                 ("blocked", crop_and_resize_blocked)):
    dt = loop_time(
        lambda b, p, i, fn=fn: fn(
            p, b.reshape(BATCH * nb, 4), i, (m, m)),
        det_boxes, (prior, bi), iters=N)
    report(f"mask-glmcrop/{name}", dt)
