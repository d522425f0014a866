"""Multi-layer (num_classes > 2) and batched-inference coverage."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from sln_amodal_tpu.config import Config
from sln_amodal_tpu.models.sln import SLNAmodal, init_params


def cfg_multilayer(**kw):
    base = dict(
        image_size=64,
        glm_input_size=33,
        pre_nms_limit=64,
        post_nms_rois_training=16,
        post_nms_rois_inference=16,
        train_rois_per_image=8,
        detection_max_instances=4,
        max_gt_instances=4,
        compute_dtype="float32",
        num_classes=4,          # 3 occlusion-depth layer channels
    )
    base.update(kw)
    return Config(**base)


def test_multilayer_shapes_train_and_infer():
    cfg = cfg_multilayer()
    assert cfg.num_layers == 3
    params = init_params(cfg, jax.random.PRNGKey(0))
    model = SLNAmodal(cfg)

    b, g, l = 1, cfg.max_gt_instances, cfg.num_layers
    images = jnp.zeros((b, 64, 64, 3))
    ids = jnp.zeros((b, g), jnp.int32).at[:, 0].set(1)
    boxes = jnp.zeros((b, g, 4)).at[0, 0].set(jnp.asarray([0.2, 0.2, 0.8, 0.8]))
    masks = jnp.zeros((b, g, l, 64, 64)).at[0, 0, 0, 16:48, 16:48].set(1.0)

    out = jax.jit(
        lambda p, k: model.apply(
            p, k, images, ids, boxes, masks, method=SLNAmodal.train_step_outputs
        )
    )(params, jax.random.PRNGKey(1))
    t, mh = cfg.train_rois_per_image, cfg.mask_shape[0]
    assert out.mask_logits.shape == (b, t, mh, mh, 4)
    assert out.targets.masks.shape == (b, t, 3, mh, mh)
    assert out.bbox_deltas.shape == (b, t, 4, 4)

    windows = jnp.asarray([[0, 0, 64, 64]], jnp.float32)
    inf = jax.jit(lambda p, x, w: model.apply(p, x, w))(params, images, windows)
    assert inf.masks.shape[-1] == 4


def test_batched_inference():
    cfg = cfg_multilayer(num_classes=2, batch_size=3)
    params = init_params(cfg, jax.random.PRNGKey(0))
    model = SLNAmodal(cfg)
    images = jnp.asarray(np.random.RandomState(0).randn(3, 64, 64, 3), jnp.float32)
    windows = jnp.tile(jnp.asarray([[0.0, 0.0, 64.0, 64.0]]), (3, 1))
    out = jax.jit(lambda p, x, w: model.apply(p, x, w))(params, images, windows)
    assert out.detections.shape == (3, cfg.detection_max_instances, 6)
    assert out.masks.shape[0] == 3
    assert np.isfinite(np.asarray(out.detections)).all()


def test_detector_contract_batch_invariant():
    """The full Detector contract (rois/class_ids/scores/masks after
    mold → device graph → unmold) is identical at batch 1 and batch 4 —
    the guarantee behind the CLI's batched-serving default
    (``--eval_batch``). The per-image pipeline is vmapped, so batching
    must not change any detection."""
    from sln_amodal_tpu.config import inference_config
    from sln_amodal_tpu.infer import Detector
    from test_e2e_ap_regression import biased_variables

    cfg = inference_config(image_size=64, name="batchinv")
    variables = biased_variables(cfg)

    rng = np.random.RandomState(3)
    # varied raw sizes so mold (squash-resize) and unmold (window rescale)
    # are exercised, not just the device graph
    images = [
        rng.randint(0, 255, (h, w, 3), np.uint8)
        for h, w in [(64, 64), (48, 80), (96, 56), (64, 72)]
    ]

    det1 = Detector(cfg, variables)
    singles = [det1.detect([im])[0] for im in images]

    cfg4 = inference_config(image_size=64, name="batchinv4", batch_size=4)
    det4 = Detector(cfg4, variables)
    batched = det4.detect(images)

    for i, (s, b) in enumerate(zip(singles, batched)):
        assert s["rois"].shape == b["rois"].shape, f"image {i}"
        np.testing.assert_array_equal(s["rois"], b["rois"], err_msg=f"image {i}")
        np.testing.assert_array_equal(s["class_ids"], b["class_ids"])
        np.testing.assert_allclose(s["scores"], b["scores"], atol=1e-5)
        np.testing.assert_array_equal(s["masks"], b["masks"])
    assert any(s["rois"].shape[0] > 0 for s in singles), "vacuous: no detections"

    # dispatch/collect software pipelining (the CLI eval loop) must equal
    # the sequential path
    h2 = det4.dispatch(images)
    h1 = det4.dispatch(list(reversed(images)))
    out2, out1 = det4.collect(h2), det4.collect(h1)
    for s, b in zip(out2, batched):
        np.testing.assert_array_equal(s["rois"], b["rois"])
        np.testing.assert_array_equal(s["masks"], b["masks"])
    for s, b in zip(out1, list(reversed(batched))):
        np.testing.assert_array_equal(s["rois"], b["rois"])


def test_collect_crops_matches_full_path():
    """The eval fast path (collect_crops → build_coco_results_crops) emits
    result dicts identical to the reference-shaped full-frame path
    (collect → build_coco_results) — same boxes, scores, and RLEs."""
    from sln_amodal_tpu.config import inference_config
    from sln_amodal_tpu.eval_amodal.coco_results import (
        build_coco_results,
        build_coco_results_crops,
    )
    from sln_amodal_tpu.infer import Detector
    from test_e2e_ap_regression import biased_variables

    # same config as test_detector_contract_batch_invariant so the jitted
    # program is shared (lru key includes the config) — no extra compile
    cfg = inference_config(image_size=64, name="batchinv")
    det = Detector(cfg, biased_variables(cfg))
    rng = np.random.RandomState(5)
    images = [rng.randint(0, 255, (48, 80, 3), np.uint8)]

    h = det.dispatch(images)
    full = det.collect(h)[0]
    h2 = det.dispatch(images)
    crops = det.collect_crops(h2)[0]

    a = build_coco_results(3, full["rois"], full["class_ids"],
                           full["scores"], full["masks"])
    b = build_coco_results_crops(3, crops["rois"], crops["class_ids"],
                                 crops["scores"], crops["crops"],
                                 crops["image_shape"])
    assert len(a) > 0, "vacuous: no detections"
    assert a == b
