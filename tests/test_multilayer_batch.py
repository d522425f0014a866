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
