"""Training pipeline tests: data loader, optimizer masks, one real jitted
train step on a multi-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sln_amodal_tpu.config import Config
from sln_amodal_tpu.data.dataset import AmodalDataset
from sln_amodal_tpu.data.pipeline import TrainLoader, build_rpn_targets, make_training_sample
from sln_amodal_tpu.models.sln import SLNAmodal, init_params
from sln_amodal_tpu.ops.anchors import config_anchors
from sln_amodal_tpu.parallel.mesh import make_mesh
from sln_amodal_tpu.train.optim import STAGES, make_optimizer, trainable_mask
from sln_amodal_tpu.train.trainer import Trainer
from sln_amodal_tpu.train import checkpoint as ckpt

from fixtures import make_synthetic_dataset


def tiny_config(**kw):
    base = dict(
        image_size=64,
        glm_input_size=33,
        pre_nms_limit=100,
        post_nms_rois_training=20,
        post_nms_rois_inference=20,
        train_rois_per_image=8,
        detection_max_instances=5,
        max_gt_instances=4,
        compute_dtype="float32",
        batch_size=2,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    make_synthetic_dataset(str(root), n_images=4, size=64)
    ds = AmodalDataset()
    ds.load_amodal(str(root), "train")
    ds.prepare()
    return ds


def test_rpn_targets_sane(synth_dataset):
    cfg = tiny_config()
    anchors = config_anchors(cfg)
    rng = np.random.default_rng(0)
    gt_boxes = np.array([[8, 8, 40, 40]], np.float32)
    match, deltas = build_rpn_targets(anchors, np.array([1]), gt_boxes, cfg, rng)
    assert match.shape == (anchors.shape[0],)
    assert (match == 1).sum() >= 1
    assert (match == 1).sum() <= cfg.rpn_train_anchors_per_image // 2
    # deltas zero for non-positive anchors
    assert np.all(deltas[match != 1] == 0)


def test_training_sample_shapes(synth_dataset):
    cfg = tiny_config()
    anchors = config_anchors(cfg)
    s = make_training_sample(synth_dataset, cfg, 0, anchors,
                             rng=np.random.default_rng(0))
    assert s is not None
    assert s["images"].shape == (64, 64, 3)
    assert s["gt_class_ids"].shape == (cfg.max_gt_instances,)
    assert s["gt_boxes"].shape == (cfg.max_gt_instances, 4)
    assert s["gt_masks"].shape == (cfg.max_gt_instances, cfg.num_layers, 64, 64)
    assert s["gt_boxes"].max() <= 1.0
    assert (s["gt_class_ids"] > 0).sum() == 2


def test_loader_batches(synth_dataset):
    cfg = tiny_config()
    loader = TrainLoader(synth_dataset, cfg, batch_size=2, seed=0)
    it = iter(loader)
    batch = next(it)
    assert batch["images"].shape == (2, 64, 64, 3)
    assert batch["rpn_match"].shape[0] == 2


@pytest.mark.slow
def test_trainable_masks():
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    for stage in ("heads", "4+", "all"):
        mask = trainable_mask(params, stage)
        flat = jax.tree_util.tree_leaves_with_path(mask)
        true_paths = ["/".join(str(getattr(k, "key", k)) for k in p)
                      for p, v in flat if v]
        false_paths = ["/".join(str(getattr(k, "key", k)) for k in p)
                       for p, v in flat if not v]
        # GLM and frozen BN never train
        assert not any(p.startswith("params/glm") for p in true_paths)
        assert not any("frozen_bn" in p for p in true_paths)
        if stage == "heads":
            assert not any(p.startswith("params/fpn/layer") for p in true_paths)
            assert any(p.startswith("params/rpn") for p in true_paths)
        if stage == "4+":
            assert any(p.startswith("params/fpn/layer4") for p in true_paths)
            assert not any(p.startswith("params/fpn/layer3") for p in true_paths)
        if stage == "all":
            assert any(p.startswith("params/fpn/layer2") for p in true_paths)
            assert any("frozen_bn" in p for p in false_paths)


@pytest.mark.slow
def test_train_step_runs_and_updates(synth_dataset):
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(jax.devices("cpu")[:2])
    trainer = Trainer(cfg, params, mesh=mesh)
    loader = TrainLoader(synth_dataset, cfg, batch_size=2, seed=0)
    # snapshot before training: the jitted step donates the param buffers
    before = np.asarray(
        params["params"]["rpn"]["conv_shared"]["kernel"]
    ).copy()
    glm_before = np.asarray(
        params["params"]["glm"]["base"]["stem"]["conv"]["kernel"]
    ).copy()
    losses = trainer.train_stage(loader, "heads", 0.01, epochs=1, steps_per_epoch=2)
    assert np.isfinite(losses["total"])
    after = np.asarray(
        trainer.variables["params"]["rpn"]["conv_shared"]["kernel"]
    )
    assert not np.allclose(before, after)
    # frozen components untouched
    glm_after = trainer.variables["params"]["glm"]["base"]["stem"]["conv"]["kernel"]
    np.testing.assert_array_equal(glm_before, np.asarray(glm_after))


@pytest.mark.slow
def test_stage_transition_carries_params(synth_dataset):
    """Two consecutive stages: params flow across optimizer rebuilds and the
    second stage unfreezes more of the tree."""
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(jax.devices("cpu")[:2])
    trainer = Trainer(cfg, params, mesh=mesh)
    loader = TrainLoader(synth_dataset, cfg, batch_size=2, seed=0)

    backbone_before = np.asarray(
        params["params"]["fpn"]["layer4"]["block0"]["conv1"]["kernel"]
    ).copy()
    trainer.train_stage(loader, "heads", 0.01, epochs=1, steps_per_epoch=1)
    after_heads = np.asarray(
        trainer.variables["params"]["fpn"]["layer4"]["block0"]["conv1"]["kernel"]
    )
    np.testing.assert_array_equal(backbone_before, after_heads)  # frozen in heads

    trainer.train_stage(loader, "4+", 0.01, epochs=1, steps_per_epoch=1)
    after_4p = np.asarray(
        trainer.variables["params"]["fpn"]["layer4"]["block0"]["conv1"]["kernel"]
    )
    assert not np.allclose(backbone_before, after_4p)  # trains in 4+


@pytest.mark.slow
def test_validate_loop(synth_dataset):
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    trainer = Trainer(cfg, params, mesh=make_mesh(jax.devices("cpu")[:1]))
    loader = TrainLoader(synth_dataset, cfg, batch_size=2, seed=0, augment=False)
    losses = trainer.validate(loader, steps=2)
    assert np.isfinite(losses["total"])
    assert set(losses) >= {"rpn_class", "rpn_bbox", "total"}


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    path = ckpt.save(params, str(tmp_path), "coco", 3)
    found, epoch = ckpt.find_last(str(tmp_path), "coco")
    assert found == path and epoch == 3
    restored = ckpt.restore(found, params)
    a = jax.tree_util.tree_leaves(params)[0]
    b = jax.tree_util.tree_leaves(restored)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _one_batch(synth_dataset, cfg, batch_size=2):
    """One deterministic batch, bypassing the threaded loader."""
    from sln_amodal_tpu.data.pipeline import make_training_sample

    anchors = config_anchors(cfg)
    rng = np.random.default_rng(0)
    samples = []
    for image_id in list(synth_dataset.image_ids):
        s = make_training_sample(synth_dataset, cfg, int(image_id), anchors,
                                 rng=rng, augment=False)
        if s is not None:
            samples.append(s)
        if len(samples) == batch_size:
            break
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


@pytest.mark.slow
def test_validate_sharded_matches_single_device(synth_dataset):
    """validate() must shard over the mesh like the train step (round-2
    review: it silently ran replicated on one device) and produce the same
    losses as the 1-device run."""
    import itertools

    cfg = tiny_config()
    batch = _one_batch(synth_dataset, cfg)
    v1 = Trainer(cfg, init_params(cfg, jax.random.PRNGKey(0)),
                 mesh=make_mesh(jax.devices("cpu")[:1])).validate(
        itertools.cycle([batch]), steps=1)
    v2 = Trainer(cfg, init_params(cfg, jax.random.PRNGKey(0)),
                 mesh=make_mesh(jax.devices("cpu")[:2])).validate(
        itertools.cycle([batch]), steps=1)
    assert set(v1) == set(v2)
    for k in v1:
        np.testing.assert_allclose(v1[k], v2[k], rtol=2e-5, atol=1e-6,
                                   err_msg=k)


@pytest.mark.slow
def test_kill_and_resume_preserves_trajectory(synth_dataset, tmp_path):
    """2 epochs uninterrupted == 1 epoch + save .state + fresh Trainer +
    resume epoch 2: params, optimizer momentum, and the per-epoch rng all
    continue (the capability the reference's broken epoch-regex never
    delivered, model.py:246-249)."""
    import itertools

    cfg = tiny_config()
    batch = _one_batch(synth_dataset, cfg)
    mesh = make_mesh(jax.devices("cpu")[:1])
    stream = lambda: itertools.cycle([batch])  # noqa: E731

    # A: uninterrupted 2 epochs
    tr_a = Trainer(cfg, init_params(cfg, jax.random.PRNGKey(0)), mesh=mesh)
    tr_a.train_stage(stream(), "heads", 0.01, epochs=2, steps_per_epoch=2)

    # B: 1 epoch, save full state, kill, resume into epoch 2
    tr_b = Trainer(cfg, init_params(cfg, jax.random.PRNGKey(0)), mesh=mesh)
    tr_b.train_stage(stream(), "heads", 0.01, epochs=1, steps_per_epoch=2)
    state_path = ckpt.save_train_state(tr_b.last_state, str(tmp_path), "cocoa", 1)
    del tr_b

    tr_c = Trainer(cfg, init_params(cfg, jax.random.PRNGKey(0)), mesh=mesh)
    tr_c.train_stage(stream(), "heads", 0.01, epochs=2, steps_per_epoch=2,
                     resume_state_path=state_path, start_epoch=1)

    la = jax.tree_util.tree_leaves(tr_a.variables)
    lc = jax.tree_util.tree_leaves(tr_c.variables)
    for a, c in zip(la, lc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-6, atol=1e-7)
