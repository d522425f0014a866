"""Data-parallel correctness: the sharded train step computes EXACTLY the
same step as single-device for the same global batch and rng, across mesh
sizes 1/2/4 (8 virtual CPU devices available; VERDICT round-1 item #8).

This turns "DP exists" into "DP is correct": the batch is sharded over the
mesh's data axis, params are replicated, and XLA's inserted gradient psum
must reproduce the unsharded mean-gradient step bit-for-bit up to float
reduction order (tolerance 1e-5).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sln_amodal_tpu.config import Config
from sln_amodal_tpu.models.sln import SLNAmodal, init_params
from sln_amodal_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from sln_amodal_tpu.train.optim import make_optimizer
from sln_amodal_tpu.train.trainer import TrainState, make_train_step

pytestmark = pytest.mark.slow

GLOBAL_BATCH = 4


def tiny_config():
    return Config(
        image_size=64,
        glm_input_size=33,
        pre_nms_limit=128,
        post_nms_rois_training=16,
        post_nms_rois_inference=16,
        train_rois_per_image=8,
        detection_max_instances=4,
        max_gt_instances=4,
        compute_dtype="float32",
        batch_size=GLOBAL_BATCH,
    )


def fixed_batch(cfg):
    b, g, l, s = GLOBAL_BATCH, cfg.max_gt_instances, cfg.num_layers, cfg.image_size
    rng = np.random.RandomState(3)
    masks = np.zeros((b, g, l, s, s), np.float32)
    masks[:, 0, 0, 8:40, 8:40] = 1.0
    batch = {
        "images": rng.randn(b, s, s, 3).astype(np.float32),
        "rpn_match": np.zeros((b, cfg.num_anchors), np.int32),
        "rpn_deltas": np.zeros((b, cfg.num_anchors, 4), np.float32),
        "gt_class_ids": np.tile(np.array([[1] + [0] * (g - 1)], np.int32), (b, 1)),
        "gt_boxes": np.tile(
            np.array([[[0.15, 0.15, 0.6, 0.6]] + [[0] * 4] * (g - 1)], np.float32),
            (b, 1, 1),
        ),
        "gt_masks": masks,
    }
    batch["rpn_match"][:, :16] = 1
    batch["rpn_match"][:, 16:32] = -1
    batch["rpn_deltas"][:, :16] = rng.randn(b, 16, 4).astype(np.float32) * 0.1
    return batch


def one_step(cfg, n_devices):
    devices = jax.devices("cpu")[:n_devices]
    model = SLNAmodal(cfg)
    variables = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(variables, "heads", cfg.learning_rate)
    state = TrainState(variables, tx.init(variables), jnp.zeros((), jnp.int32))
    step_fn = make_train_step(model, cfg, tx)
    batch = fixed_batch(cfg)
    if n_devices == 1:
        jit_step = jax.jit(step_fn)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
    else:
        mesh = make_mesh(devices)
        jit_step = jax.jit(
            step_fn,
            in_shardings=(replicate(mesh), replicate(mesh), batch_sharding(mesh)),
            out_shardings=(replicate(mesh), replicate(mesh)),
        )
        batch = shard_batch(batch, mesh)
    state, losses = jit_step(state, jax.random.PRNGKey(7), batch)
    probe = np.asarray(state.params["params"]["rpn"]["conv_shared"]["kernel"])
    return {k: float(v) for k, v in losses.items()}, probe


def test_sharded_step_equals_single_device():
    if len(jax.devices("cpu")) < 4:
        pytest.skip("needs >= 4 virtual cpu devices")
    cfg = tiny_config()
    ref_losses, ref_probe = one_step(cfg, 1)
    assert np.isfinite(ref_losses["total"])
    for n in (2, 4):
        losses, probe = one_step(cfg, n)
        for k, v in ref_losses.items():
            assert abs(v - losses[k]) < 1e-5, (n, k, v, losses[k])
        np.testing.assert_allclose(probe, ref_probe, atol=1e-6,
                                   err_msg=f"params diverge at mesh size {n}")


def test_device_prep_loader_feeds_sharded_trainer(tmp_path):
    """The composed SPMD pipeline in test form: DevicePrepLoader sharded
    over a 2-device mesh feeding Trainer.train_stage with the same mesh —
    one epoch runs, losses are finite, params update, and the prep output
    batches really are sharded batch-first."""
    import sys
    sys.path.insert(0, "tests")
    from fixtures import make_synthetic_dataset
    from sln_amodal_tpu.data.dataset import AmodalDataset
    from sln_amodal_tpu.data.device_prep import DevicePrepLoader
    from sln_amodal_tpu.train.trainer import Trainer

    if len(jax.devices("cpu")) < 2:
        pytest.skip("needs >=2 devices")
    root = str(tmp_path)
    make_synthetic_dataset(root, n_images=2, size=64, subset="train")
    ds = AmodalDataset()
    ds.load_amodal(root, "train")
    ds.prepare()

    cfg = tiny_config().replace(batch_size=2)
    mesh = make_mesh(jax.devices("cpu")[:2])
    loader = DevicePrepLoader(ds, cfg, seed=0, workers=1, mesh=mesh)
    batch = next(iter(loader))
    assert len(batch["images"].sharding.device_set) == 2

    trainer = Trainer(cfg, init_params(cfg, jax.random.PRNGKey(0)), mesh=mesh)
    before = np.asarray(
        trainer.variables["params"]["rpn"]["conv_shared"]["kernel"]).copy()
    losses = trainer.train_stage(loader, "heads", cfg.learning_rate,
                                 epochs=1, steps_per_epoch=2)
    assert np.isfinite(losses["total"])
    after = np.asarray(
        trainer.variables["params"]["rpn"]["conv_shared"]["kernel"])
    assert not np.array_equal(before, after), "params did not update"
