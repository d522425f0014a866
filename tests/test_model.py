"""Model graph smoke tests on a tiny config (CPU, fast)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from sln_amodal_tpu.config import Config
from sln_amodal_tpu.models.sln import SLNAmodal, init_params


def tiny_config(**kw):
    base = dict(
        image_size=128,
        glm_input_size=65,
        pre_nms_limit=200,
        post_nms_rois_training=50,
        post_nms_rois_inference=50,
        train_rois_per_image=16,
        detection_max_instances=10,
        max_gt_instances=8,
        compute_dtype="float32",
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_config()
    model = SLNAmodal(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, model, params


def test_inference_shapes(model_and_params):
    cfg, model, params = model_and_params
    images = jnp.asarray(np.random.RandomState(0).randn(1, 128, 128, 3), jnp.float32)
    windows = jnp.asarray([[0, 0, 128, 128]], jnp.float32)
    out = jax.jit(lambda p, x, w: model.apply(p, x, w))(params, images, windows)
    d = cfg.detection_max_instances
    assert out.detections.shape == (1, d, 6)
    assert out.det_valid.shape == (1, d)
    m = cfg.mask_pool_size * 2
    assert out.masks.shape == (1, d, m, m, cfg.num_classes)
    assert out.global_label.shape == (1, 128, 128)
    assert np.isfinite(np.asarray(out.detections)).all()
    assert np.isfinite(np.asarray(out.masks)).all()
    # mask channel 1 is a probability (sigmoid of layer-sum)
    ch1 = np.asarray(out.masks[..., 1])
    assert (ch1 >= 0).all() and (ch1 <= 1).all()


def test_training_shapes_and_losses(model_and_params):
    cfg, model, params = model_and_params
    rng = jax.random.PRNGKey(1)
    b, g, l = 1, cfg.max_gt_instances, cfg.num_layers
    images = jnp.asarray(np.random.RandomState(1).randn(b, 128, 128, 3), jnp.float32)
    # one GT box occupying the center
    gt_ids = jnp.zeros((b, g), jnp.int32).at[:, 0].set(1)
    gt_boxes = jnp.zeros((b, g, 4)).at[0, 0].set(jnp.asarray([0.25, 0.25, 0.75, 0.75]))
    gt_masks = jnp.zeros((b, g, l, 128, 128))
    gt_masks = gt_masks.at[0, 0, 0, 32:96, 32:96].set(1.0)

    def run(p, key, x):
        return model.apply(
            p, key, x, gt_ids, gt_boxes, gt_masks, method=SLNAmodal.train_step_outputs
        )

    out = jax.jit(run)(params, rng, images)
    t = cfg.train_rois_per_image
    assert out.targets.rois.shape == (b, t, 4)
    assert out.class_logits.shape == (b, t, cfg.num_classes)
    assert out.bbox_deltas.shape == (b, t, cfg.num_classes, 4)
    mh = cfg.mask_pool_size * 2
    assert out.mask_logits.shape == (b, t, mh, mh, cfg.num_classes)
    assert out.rpn_logits.shape[0] == b and out.rpn_logits.shape[2] == 2

    # losses compute and are finite
    from sln_amodal_tpu.train import losses as L

    a = out.rpn_logits.shape[1]
    rpn_match = jnp.zeros((a,), jnp.int32).at[0].set(1).at[1].set(-1)
    rpn_tgt = jnp.zeros((a, 4))
    loss = L.total_loss(
        rpn_match=rpn_match,
        rpn_target_deltas=rpn_tgt,
        rpn_logits=out.rpn_logits[0],
        rpn_pred_deltas=out.rpn_deltas[0],
        target_class_ids=out.targets.class_ids[0],
        roi_valid=out.targets.valid[0],
        mrcnn_class_logits=out.class_logits[0],
        target_deltas=out.targets.deltas[0],
        mrcnn_pred_deltas=out.bbox_deltas[0],
        target_masks=out.targets.masks[0],
        mask_logits=out.mask_logits[0],
    )
    for k, v in loss.items():
        assert np.isfinite(float(v)), k


def test_detect_only_matches_full_infer(model_and_params):
    """The detect-only path (global label not materialized) must reproduce
    the full graph's detections and masks exactly; the glm_elide fast mode
    must agree on detections always and on masks for interior boxes (edge
    boxes legitimately sample the prior's first row/col through the
    reference's pixel-coords quirk)."""
    from sln_amodal_tpu.models.sln import SLNAmodal

    cfg, model, params = model_and_params
    assert cfg.glm_prior_pixel_coords_at_inference
    images = jnp.asarray(np.random.RandomState(7).randn(1, 128, 128, 3), jnp.float32)
    windows = jnp.asarray([[0, 0, 128, 128]], jnp.float32)
    full = jax.jit(lambda p, x, w: model.apply(p, x, w))(params, images, windows)
    fast = jax.jit(
        lambda p, x, w: model.apply(p, x, w, method=SLNAmodal.infer_detect_only)
    )(params, images, windows)
    np.testing.assert_array_equal(np.asarray(full.detections), np.asarray(fast.detections))
    np.testing.assert_array_equal(np.asarray(full.det_valid), np.asarray(fast.det_valid))
    np.testing.assert_allclose(
        np.asarray(full.masks), np.asarray(fast.masks), rtol=0, atol=0
    )

    elide_model = SLNAmodal(cfg.replace(glm_elide_at_inference=True))
    elided = jax.jit(
        lambda p, x, w: elide_model.apply(
            p, x, w, method=SLNAmodal.infer_detect_only
        )
    )(params, images, windows)
    np.testing.assert_array_equal(
        np.asarray(full.detections), np.asarray(elided.detections)
    )
    det = np.asarray(full.detections[0])
    interior = (det[:, 0] > 1.5) & (det[:, 1] > 1.5)
    assert interior.any()
    # literal-zero vs computed-zero GLM crops change XLA fusion order in the
    # mask convs — float-noise tolerance, not a semantic difference
    np.testing.assert_allclose(
        np.asarray(full.masks[0])[interior],
        np.asarray(elided.masks[0])[interior],
        atol=1e-5,
    )


def test_param_count_plausible(model_and_params):
    from sln_amodal_tpu.utils.logging import count_params

    _, _, params = model_and_params
    n = count_params(params)
    # ResNet-101 FPN + heads + DeepLab-101 ≈ 85-110M params
    assert 60e6 < n < 150e6, n
