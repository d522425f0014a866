"""Cumulative-prefix timing of the inference graph on the real TPU.

``profile_infer.py`` times each stage as an ISOLATED program; the whole
graph runs ~7 ms slower than the stage sum (round 3). This script times
cumulative PREFIXES of the real graph — fpn; fpn+rpn; +glm; +proposals;
+classifier; +refine; +mask — so consecutive deltas expose each stage's
*in-context* cost (inter-stage layouts, fusion boundaries, scheduling)
instead of its isolated cost.

Run from the repo root: ``python scripts/profile_prefix.py [batch]``.
Per-stage times are reported per IMAGE (divided by batch) so batch-scaling
of each stage is directly comparable across runs.
"""
import sys

sys.path.insert(0, ".")

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1

import jax
import jax.numpy as jnp
import numpy as np

from sln_amodal_tpu.utils.runtime import setup_runtime

setup_runtime()

from sln_amodal_tpu.config import inference_config
from sln_amodal_tpu.models.sln import SLNAmodal, init_params
from sln_amodal_tpu.detect.detection import refine_detections
from sln_amodal_tpu.utils.benchmark import loop_time

config = inference_config(compute_dtype="bfloat16")
# optional overrides: python scripts/profile_prefix.py [batch] [roi_impl]
# [glm_crop_impl] — e.g. "blocked gather" to reproduce the pre-patch paths
if len(sys.argv) > 2:
    config = config.replace(roi_align_impl=sys.argv[2])
if len(sys.argv) > 3:
    config = config.replace(glm_crop_impl=sys.argv[3])
model = SLNAmodal(config)
variables = init_params(config, jax.random.PRNGKey(0))

s = config.image_size
rng = np.random.RandomState(0)
images = jnp.asarray(rng.randn(BATCH, s, s, 3).astype(np.float32))
# dynamic per-image windows, exactly as the real inference path threads them
# (sln.py) — a baked Python tuple would let XLA constant-fold the window
# clip in refine_detections and under-count the refine stage
windows = jnp.tile(
    jnp.asarray([[0.0, 0.0, float(s), float(s)]], jnp.float32), (BATCH, 1))

N = 20


def scalar(*trees):
    # DCE guard only: sum a sparse stride of each kept intermediate so the
    # guard itself costs ~nothing — a full-tensor sum would be paid by every
    # prefix EXCEPT the final one and skew consecutive deltas
    return sum(
        jnp.sum(v.ravel()[::4096]).astype(jnp.float32)
        for t in trees
        for v in jax.tree_util.tree_leaves(t)
    )


def prefix(upto: str):
    """Build a fn(images, windows)->scalar running the real graph through
    stage ``upto``; every intermediate needed later is also folded into the
    output so nothing is DCE'd."""

    def run(m: SLNAmodal, x, wins):
        cfg = m.config
        p2, p3, p4, p5, p6 = m.fpn(x)
        feats = (p2, p3, p4, p5)
        if upto == "fpn":
            return scalar(feats, p6)
        _, rpn_probs, rpn_deltas = m._rpn_all_levels((p2, p3, p4, p5, p6))
        if upto == "rpn":
            return scalar(feats, rpn_probs, rpn_deltas)
        glm_prior, _ = m._glm_prior(x, need_label=False)
        if upto == "glm":
            return scalar(feats, rpn_probs, rpn_deltas, glm_prior)
        rois, roi_valid = m._proposals(
            rpn_probs, rpn_deltas, cfg.post_nms_rois_inference
        )
        if upto == "proposals":
            return scalar(feats, glm_prior, rois, roi_valid)
        _, probs, deltas = m._classifier_on(feats, rois)
        if upto == "classifier":
            return scalar(feats, glm_prior, rois, roi_valid, probs, deltas)

        def refine_one(rois_i, valid_i, probs_i, deltas_i, window_i):
            return refine_detections(
                rois_i, valid_i, probs_i, deltas_i, window_i,
                image_size=cfg.image_size,
                bbox_std_dev=cfg.rpn_bbox_std_dev,
                max_instances=cfg.detection_max_instances,
                min_confidence=cfg.detection_min_confidence,
                use_nms=cfg.use_nms,
                nms_threshold=cfg.detection_nms_threshold,
            )

        detections, det_valid = jax.vmap(refine_one)(
            rois, roi_valid, probs, deltas, wins)
        if upto == "refine":
            return scalar(feats, glm_prior, detections, det_valid)

        det_px = jnp.clip(detections[..., :4], 0.0, float(cfg.image_size))
        det_norm = det_px / float(cfg.image_size)
        glm_boxes = det_px if cfg.glm_prior_pixel_coords_at_inference else det_norm
        mask_logits = m._mask_on(feats, det_norm, glm_prior, glm_boxes)
        layer_sum = jax.nn.sigmoid(jnp.sum(mask_logits[..., 1:], axis=-1))
        masks = mask_logits.at[..., 1].set(layer_sum)
        return scalar(detections, det_valid, masks)

    return run


STAGES = ["fpn", "rpn", "glm", "proposals", "classifier", "refine", "mask"]
prev = 0.0
print(f"batch={BATCH}; all times per image")
for st in STAGES:
    fn = prefix(st)
    dt = loop_time(
        lambda x, v, w: model.apply(
            v, x, w, method=lambda m, xx, ww: fn(m, xx, ww)),
        images, (variables, windows), iters=N,
    ) / BATCH
    print(f"prefix ..{st:12s} {dt * 1e3:8.2f} ms  (+{(dt - prev) * 1e3:6.2f})",
          flush=True)
    prev = dt
