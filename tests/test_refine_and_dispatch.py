"""Refine-head extension seam + NMS implementation dispatch tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sln_amodal_tpu.config import Config
from sln_amodal_tpu.detect.proposal import _nms_dispatch
from sln_amodal_tpu.models.sln import SLNAmodal, init_params
from sln_amodal_tpu.ops.nms import nms_sorted
from sln_amodal_tpu.ops.nms_pallas import nms_sorted_pallas


def test_nms_dispatch():
    assert _nms_dispatch("xla") is nms_sorted
    assert _nms_dispatch("pallas") is nms_sorted_pallas
    # auto on CPU → xla
    assert _nms_dispatch("auto") is nms_sorted


@pytest.mark.slow
def test_refine_head_train_outputs():
    cfg = Config(
        image_size=64,
        glm_input_size=33,
        pre_nms_limit=64,
        post_nms_rois_training=16,
        post_nms_rois_inference=16,
        train_rois_per_image=8,
        detection_max_instances=4,
        max_gt_instances=4,
        compute_dtype="float32",
        use_refine_head=True,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    assert "amodal_refine" in params["params"]
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
    t = cfg.train_rois_per_image
    mh = cfg.mask_shape[0]
    assert out.refined.shape == (b, t, 2 * mh, 2 * mh, cfg.num_classes)
    assert np.isfinite(np.asarray(out.refined)).all()
