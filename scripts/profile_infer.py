"""Stage-by-stage timing of the inference graph on the real TPU.

Run from the repo root: ``python scripts/profile_infer.py``.

Methodology (same as bench.py): each stage is wrapped in ONE compiled
``lax.fori_loop`` program with the next iteration's input data-dependent on
the previous output, and the final scalar fetched to host. Per-call host
dispatch on this platform pays a 3-60 ms tunnel RTT (decaying with process
warmup), so Python-loop-per-call timing wildly overstates device time;
``block_until_ready`` alone under-counts instead. Params are passed as
arguments — closing over them embeds them as HLO constants and overflows
the remote-compile request body (HTTP 413).
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sln_amodal_tpu.utils.runtime import setup_runtime

setup_runtime()

from sln_amodal_tpu.config import inference_config
from sln_amodal_tpu.models.sln import SLNAmodal, init_params

config = inference_config(compute_dtype="bfloat16")
model = SLNAmodal(config)
variables = init_params(config, jax.random.PRNGKey(0))

s = config.image_size
rng = np.random.RandomState(0)
images = jnp.asarray(rng.randn(1, s, s, 3).astype(np.float32))
windows = jnp.asarray([[0.0, 0.0, float(s), float(s)]], jnp.float32)

N = 20


from sln_amodal_tpu.utils.benchmark import loop_time as _loop_time  # noqa: E402


def scalar(tree):
    return sum(jnp.sum(v).astype(jnp.float32)
               for v in jax.tree_util.tree_leaves(tree))


def loop_time(name, step):
    dt = _loop_time(lambda x, v: step(v, x), images, (variables,), iters=N)
    print(f"{name:34s} {dt * 1e3:8.2f} ms/iter", flush=True)


loop_time("detect-only exact (with GLM)", lambda v, x: scalar(
    model.apply(v, x, windows, method=SLNAmodal.infer_detect_only)))

m_elide = SLNAmodal(config.replace(glm_elide_at_inference=True))
loop_time("detect-only elide-GLM", lambda v, x: scalar(
    m_elide.apply(v, x, windows, method=SLNAmodal.infer_detect_only)))

loop_time("full infer (incl. global label)", lambda v, x: scalar(
    model.apply(v, x, windows)))

loop_time("glm prior (MSC 1+0.5+0.75)", lambda v, x: scalar(
    model.apply(v, x, method=lambda m, im: m._glm_prior(im, need_label=False))[0]))

loop_time("resnet101-fpn", lambda v, x: scalar(
    model.apply(v, x, method=lambda m, im: m.fpn(im))))

# ---- per-stage breakdown of the detect path (round 2) ---------------------
# Each stage loops on ITS OWN precomputed inputs so the stage cost is
# isolated; inputs come from one non-timed forward.

print("\n-- detect-path stage breakdown --", flush=True)

feats = model.apply(variables, images, method=lambda m, im: m.fpn(im))
p2, p3, p4, p5, p6 = feats
rpn_out = model.apply(
    variables, feats,
    method=lambda m, f: m._rpn_all_levels(tuple(f)))
_, rpn_probs, rpn_deltas = rpn_out
rois, roi_valid = model.apply(
    variables, rpn_probs, rpn_deltas,
    method=lambda m, p, d: m._proposals(p, d, config.post_nms_rois_inference))


def loop_on(name, step, x0):
    dt = _loop_time(lambda xc, v: step(v, xc), x0, (variables,), iters=N)
    print(f"{name:34s} {dt * 1e3:8.2f} ms/iter", flush=True)


loop_on("fpn backbone (1024^2)", lambda v, x: model.apply(
    v, x, method=lambda m, im: m.fpn(im)), images)
loop_on("rpn heads (P2..P6)", lambda v, f: model.apply(
    v, f, method=lambda m, ff: m._rpn_all_levels(tuple(ff))), feats)
loop_on("proposal layer (topk+nms->1000)", lambda v, pd: model.apply(
    v, pd[0], pd[1],
    method=lambda m, p, d: m._proposals(p, d, config.post_nms_rois_inference)),
    (rpn_probs, rpn_deltas))
loop_on("classifier (roialign 1000 + head)", lambda v, r: model.apply(
    v, tuple(feats[:4]), r,
    method=lambda m, ff, rr: m._classifier_on(ff, rr)), rois)

_, cls_probs, cls_deltas = model.apply(
    variables, tuple(feats[:4]), rois,
    method=lambda m, ff, rr: m._classifier_on(ff, rr))

from sln_amodal_tpu.detect.detection import refine_detections  # noqa: E402


def refine_batch(v, inp):
    rr, vv, pp, dd = inp
    def one(rois_i, valid_i, probs_i, deltas_i):
        return refine_detections(
            rois_i, valid_i, probs_i, deltas_i,
            (0.0, 0.0, float(s), float(s)),
            image_size=config.image_size,
            bbox_std_dev=config.rpn_bbox_std_dev,
            max_instances=config.detection_max_instances,
            min_confidence=config.detection_min_confidence,
            use_nms=config.use_nms,
            nms_threshold=config.detection_nms_threshold)
    return jax.vmap(one)(rr, vv, pp, dd)


loop_on("detection refine (top-100)", refine_batch,
        (rois, roi_valid, cls_probs, cls_deltas))

dets = refine_batch(variables, (rois, roi_valid, cls_probs, cls_deltas))[0]
det_boxes = jnp.clip(dets[..., :4], 0.0, float(s)) / float(s)
loop_on("mask head (100 rois, zero prior)", lambda v, bx: model.apply(
    v, tuple(feats[:4]), bx, None, bx,
    method=lambda m, ff, b1, gp, b2: m._mask_on(ff, b1, gp, b2)), det_boxes)


# ---- cumulative prefixes (round 3) ----------------------------------------
# Isolated stage programs miss in-context costs (inter-stage layouts, fusion
# boundaries, scheduling). Each prefix below runs stages 1..k end-to-end
# from the image; consecutive deltas are the IN-CONTEXT cost of each stage.
# GLM is elided so this decomposes the detect path (the GLM's in-context
# cost is already pinned by [exact] - [elide-GLM] above).

print("\n-- cumulative prefixes (elide-GLM detect path, in-context) --",
      flush=True)

from sln_amodal_tpu.detect.detection import refine_detections as _refine  # noqa: E402


def _prefix(k):
    def run(m, im):
        cfg = m.config
        p2, p3, p4, p5, p6 = m.fpn(im)
        if k == 1:
            return (p2, p3, p4, p5, p6)
        _, probs, deltas = m._rpn_all_levels((p2, p3, p4, p5, p6))
        if k == 2:
            return (probs, deltas)
        rois, valid = m._proposals(probs, deltas, cfg.post_nms_rois_inference)
        if k == 3:
            return (rois, valid)
        _, cprobs, cdeltas = m._classifier_on((p2, p3, p4, p5), rois)
        if k == 4:
            return (cprobs, cdeltas)

        def refine_one(rois_i, valid_i, probs_i, deltas_i):
            return _refine(
                rois_i, valid_i, probs_i, deltas_i,
                (0.0, 0.0, float(cfg.image_size), float(cfg.image_size)),
                image_size=cfg.image_size,
                bbox_std_dev=cfg.rpn_bbox_std_dev,
                max_instances=cfg.detection_max_instances,
                min_confidence=cfg.detection_min_confidence,
                use_nms=cfg.use_nms,
                nms_threshold=cfg.detection_nms_threshold)

        dets, dval = jax.vmap(refine_one)(rois, valid, cprobs, cdeltas)
        if k == 5:
            return (dets, dval)
        det_px = jnp.clip(dets[..., :4], 0.0, float(cfg.image_size))
        det_norm = det_px / float(cfg.image_size)
        mask = m._mask_on((p2, p3, p4, p5), det_norm, None, det_px)
        return (dets, dval, mask)

    return run


_prev = 0.0
for _k, _name in [(1, "fpn"), (2, "+rpn"), (3, "+proposal"),
                  (4, "+classifier"), (5, "+refine"), (6, "+mask")]:
    _run = _prefix(_k)
    _dt = _loop_time(
        lambda x, v, r=_run: scalar(m_elide.apply(v, x, method=r)),
        images, (variables,), iters=N) * 1e3
    print(f"{_name:20s} cum {_dt:7.2f} ms   delta {_dt - _prev:7.2f} ms",
          flush=True)
    _prev = _dt
