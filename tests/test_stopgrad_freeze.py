"""Stage freezing via stop_gradient: the heads-stage train step with the
``trainable`` mask must compute EXACTLY the same update as the round-2 step
that took all grads and let ``optim._zero_frozen`` zero the frozen ones
(the zeroing runs before clipping, so the clip norm already excluded frozen
grads — the two programs are mathematically identical).

Cost facts pinned here (measured via XLA cost analysis):

1. The plain jitted heads-stage step ALREADY elides the frozen backward
   without the mask — ``_zero_frozen`` replaces those grads with zero
   constants before any consumer, so XLA dead-code-eliminates the whole
   ResNet-FPN backward. Pinned as: heads-stage step flops < all-stage
   step flops, mask or no mask.
2. Under gradient accumulation (``optax.MultiSteps``) the raw grads are
   stored in the accumulator, so they are NOT dead and XLA must compute
   the frozen backward — there the ``stop_gradient`` freeze is the only
   thing that elides it. Pinned as: masked MultiSteps step flops <
   unmasked MultiSteps step flops.

Reference analog: ``model.py:347-353`` — ``requires_grad = False`` stops
torch's autograd at the frozen layers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sln_amodal_tpu.config import Config
from sln_amodal_tpu.models.sln import SLNAmodal, init_params
from sln_amodal_tpu.train.optim import make_optimizer, trainable_mask
from sln_amodal_tpu.train.trainer import TrainState, make_train_step

pytestmark = pytest.mark.slow

BATCH = 2


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
        batch_size=BATCH,
    )


def fixed_batch(cfg):
    b, g, l, s = BATCH, cfg.max_gt_instances, cfg.num_layers, cfg.image_size
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
    return {k: jnp.asarray(v) for k, v in batch.items()}


def _flops(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float((ca or {}).get("flops", 0.0))


def test_heads_stage_stopgrad_step_matches_full_backward():
    cfg = tiny_config()
    model = SLNAmodal(cfg)
    variables = init_params(cfg, jax.random.PRNGKey(0))
    batch = fixed_batch(cfg)
    rng = jax.random.PRNGKey(7)
    mask = trainable_mask(variables, "heads")

    results = {}
    costs = {}
    for name, stage, trainable in (
        ("full", "heads", None),
        ("masked", "heads", mask),
        ("all", "all", trainable_mask(variables, "all")),
    ):
        tx = make_optimizer(variables, stage, cfg.learning_rate)
        state = TrainState(variables, tx.init(variables),
                           jnp.zeros((), jnp.int32))
        step_fn = make_train_step(model, cfg, tx, trainable=trainable)
        compiled = jax.jit(step_fn).lower(state, rng, batch).compile()
        costs[name] = _flops(compiled)
        if name == "all":
            continue  # only the cost is needed for the all-stage step
        new_state, losses = compiled(state, rng, batch)
        results[name] = (jax.device_get(new_state.params),
                         {k: float(v) for k, v in losses.items()})

    full_params, full_losses = results["full"]
    masked_params, masked_losses = results["masked"]
    assert full_losses == masked_losses
    flat_full = jax.tree_util.tree_leaves_with_path(full_params)
    flat_masked = dict(jax.tree_util.tree_leaves_with_path(masked_params))
    assert len(flat_full) == len(flat_masked)
    for path, leaf in flat_full:
        np.testing.assert_allclose(
            leaf, flat_masked[path], rtol=0, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))

    # Cost fact 1 (module docstring): the frozen backward is gone from the
    # heads-stage step either way — _zero_frozen's zero constants let XLA
    # DCE it without the mask, and the mask elides it at trace time.
    if all(costs.values()):
        assert costs["masked"] < costs["all"], costs
        assert costs["full"] < costs["all"], costs
        assert costs["masked"] <= costs["full"] * 1.001, costs


def test_multisteps_accumulation_needs_the_mask_to_elide():
    """Cost fact 2: MultiSteps keeps raw grads live in its accumulator, so
    only the stop_gradient freeze removes the frozen backward there."""
    import optax

    cfg = tiny_config()
    model = SLNAmodal(cfg)
    variables = init_params(cfg, jax.random.PRNGKey(0))
    batch = fixed_batch(cfg)
    rng = jax.random.PRNGKey(7)

    costs = {}
    for name, trainable in (("unmasked", None),
                            ("masked", trainable_mask(variables, "heads"))):
        tx = optax.MultiSteps(
            make_optimizer(variables, "heads", cfg.learning_rate),
            every_k_schedule=2)
        state = TrainState(variables, tx.init(variables),
                           jnp.zeros((), jnp.int32))
        step_fn = make_train_step(model, cfg, tx, trainable=trainable)
        costs[name] = _flops(
            jax.jit(step_fn).lower(state, rng, batch).compile())

    if all(costs.values()):
        assert costs["masked"] < 0.99 * costs["unmasked"], costs


def test_all_stage_mask_trains_everything_but_bn_and_glm():
    cfg = tiny_config()
    variables = init_params(cfg, jax.random.PRNGKey(0))
    mask = trainable_mask(variables, "all")
    flat = jax.tree_util.tree_leaves_with_path(mask)
    assert any(m for _, m in flat)
    for path, m in flat:
        p = jax.tree_util.keystr(path)
        if "glm" in p or "frozen_bn" in p:
            assert not m, p
        else:
            assert m, p
