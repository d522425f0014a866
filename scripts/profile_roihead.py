"""Split the b8 classifier/mask stage cost into gather vs head compute.

The round-4 prefix profile (scripts/profile_prefix.py 8) shows, per image
at b8: classifier stage +2.46 ms, mask stage +3.90 ms — an order of
magnitude over their FLOP roofline (classifier head ≈ 0.16 ms/img of
matmul, mask head ≈ 0.8 ms/img). This script times each ingredient as its
own loop program at the production b8 shapes so the gap is attributable:

  cls-roialign : pyramid_roi_align_batched, 1000 boxes/img @ 7x7
  cls-head     : ClassifierHead on [8000, 7, 7, 256] crops
  mask-roialign: pyramid_roi_align_batched, 100 boxes/img @ 16x16
  mask-glmcrop : crop_and_resize of the [8, 65, 65, 183] GLM prior, 800 boxes
  mask-head    : MaskHead on [800, 16, 16, 256+183] crops

Run from the repo root on the real TPU:
``python scripts/profile_roihead.py [batch]``.
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
from sln_amodal_tpu.models.heads import ClassifierHead, MaskHead
from sln_amodal_tpu.ops.roi_align import (
    crop_and_resize,
    pyramid_roi_align_batched,
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

# realistic box-size mix: log-uniform spans -> hits all pyramid levels
def rand_boxes(n):
    c = rng.rand(BATCH, n, 2)
    span = np.exp(rng.uniform(np.log(0.01), np.log(0.6), (BATCH, n, 2)))
    y1x1 = np.clip(c - span / 2, 0, 1)
    y2x2 = np.clip(c + span / 2, 0, 1)
    return np.concatenate([y1x1, y2x2], -1).astype(np.float32)


cls_boxes = put(rand_boxes(config.post_nms_rois_inference), jnp.float32)
det_boxes = put(rand_boxes(config.detection_max_instances), jnp.float32)

N = 20


def report(name, dt, note=""):
    print(f"{name:16s} {dt * 1e3:8.3f} ms/batch "
          f"({dt / BATCH * 1e3:7.3f} ms/img) {note}", flush=True)


# 1. classifier-stage RoIAlign
dt = loop_time(
    lambda b, f: pyramid_roi_align_batched(
        f, b, (config.pool_size, config.pool_size), (s, s)),
    cls_boxes, (feats,), iters=N)
report("cls-roialign", dt)

# 2. classifier head alone
crops = put(rng.randn(
    BATCH * config.post_nms_rois_inference, config.pool_size,
    config.pool_size, config.fpn_channels).astype(np.float32))
head = ClassifierHead(config.num_classes, config.pool_size, dtype=DT)
hv = head.init(jax.random.PRNGKey(0), crops[:2])
dt = loop_time(lambda c, v: head.apply(v, c)[0], crops, (hv,), iters=N)
report("cls-head", dt)

# 3. mask-stage RoIAlign
m = config.mask_pool_size
dt = loop_time(
    lambda b, f: pyramid_roi_align_batched(f, b, (m, m), (s, s)),
    det_boxes, (feats,), iters=N)
report("mask-roialign", dt)

# 4. GLM prior crop (65^2 grid, 183 ch)
g = (config.glm_input_size - 1) // 8 + 1
prior = put(rng.randn(BATCH, g, g, config.glm_num_classes + 1)
            .astype(np.float32))
nb = config.detection_max_instances
bi = put(np.repeat(np.arange(BATCH, dtype=np.int32), nb), jnp.int32)
dt = loop_time(
    lambda b, p, i: crop_and_resize(
        p, b.reshape(BATCH * nb, 4), i, (m, m)),
    det_boxes, (prior, bi), iters=N)
report("mask-glmcrop", dt)

# 5. mask head alone
fpn_c = put(rng.randn(BATCH * nb, m, m, config.fpn_channels)
            .astype(np.float32))
glm_c = put(rng.randn(BATCH * nb, m, m, config.glm_num_classes + 1)
            .astype(np.float32))
mh = MaskHead(config.num_classes, dtype=DT)
mv = mh.init(jax.random.PRNGKey(0), fpn_c[:2], glm_c[:2])
dt = loop_time(lambda f, g_, v: mh.apply(v, f, g_)[0], fpn_c, (glm_c, mv),
               iters=N)
report("mask-head", dt)
