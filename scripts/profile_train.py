"""Stage-by-stage timing of the TRAINING step on the real TPU.

Run from the repo root: ``python scripts/profile_train.py [batch]``.

Same in-graph fori_loop methodology as scripts/profile_infer.py /
bench.py (one compiled loop, data-dependent carry, params/batch as
arguments — closures embed HLO constants and overflow the remote-compile
body). Decomposition: the full step (value_and_grad + clip + SGD, per stage —
"heads" elides the frozen backbone's backward via the stop_gradient
freeze, "all" is the full backward) against its pieces — forward+losses
only, all-params grad without the optimizer update, the frozen-GLM prior,
and the backbone — so backward and optimizer cost fall out by
subtraction. Reference analog: the torch loop at
``/root/reference/model.py:415-448`` (never profiled upstream).
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sln_amodal_tpu.utils.runtime import setup_runtime

setup_runtime()

from sln_amodal_tpu.config import training_config
from sln_amodal_tpu.models.sln import SLNAmodal, init_params
from sln_amodal_tpu.train.optim import make_optimizer, trainable_mask
from sln_amodal_tpu.train.trainer import (
    TrainState, batched_losses, make_train_step)
from sln_amodal_tpu.utils.benchmark import loop_time

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N = 8

config = training_config(compute_dtype="bfloat16", batch_size=BATCH)
model = SLNAmodal(config)
variables = init_params(config, jax.random.PRNGKey(0))

s, g, l = config.image_size, config.max_gt_instances, config.num_layers
rng = np.random.RandomState(0)
masks = np.zeros((BATCH, g, l, s, s), np.float32)
masks[:, 0, 0, s // 4: 3 * s // 4, s // 4: 3 * s // 4] = 1.0
batch = {
    "images": jnp.asarray(
        rng.uniform(-120, 130, (BATCH, s, s, 3)).astype(np.float32)),
    "rpn_match": jnp.asarray(np.concatenate(
        [np.ones((BATCH, 32), np.int32), -np.ones((BATCH, 32), np.int32),
         np.zeros((BATCH, config.num_anchors - 64), np.int32)], axis=1)),
    "rpn_deltas": jnp.asarray(
        rng.randn(BATCH, config.num_anchors, 4).astype(np.float32) * 0.1),
    "gt_class_ids": jnp.asarray(
        np.tile(np.array([[1] + [0] * (g - 1)], np.int32), (BATCH, 1))),
    "gt_boxes": jnp.asarray(np.tile(
        np.array([[[0.25, 0.25, 0.75, 0.75]] + [[0] * 4] * (g - 1)],
                 np.float32), (BATCH, 1, 1))),
    "gt_masks": jnp.asarray(masks),
}
key = jax.random.PRNGKey(7)


def report(name, dt):
    print(f"{name:42s} {dt * 1e3:8.1f} ms/iter", flush=True)


def _loss_from(v, k, data):
    out = model.apply(
        v, k, data["images"], data["gt_class_ids"],
        data["gt_boxes"].astype(jnp.float32),
        data["gt_masks"].astype(jnp.float32),
        method=SLNAmodal.train_step_outputs)
    return batched_losses(config, out, data)["total"]


def fwd_step(acc, v, data):
    # fold the carry into the rng so every iteration re-samples ROIs
    return acc + _loss_from(v, jax.random.fold_in(key, acc.astype(jnp.int32)),
                            data)


def grad_step(acc, v, data):
    k = jax.random.fold_in(key, acc.astype(jnp.int32))
    val, grads = jax.value_and_grad(
        lambda p: _loss_from(p, k, data))(v)
    gsum = sum(jnp.sum(t).astype(jnp.float32)
               for t in jax.tree_util.tree_leaves(grads))
    return acc + val + gsum * 1e-20


t_fwd = loop_time(fwd_step, jnp.float32(0.0), (variables, batch), iters=N)
report("forward + 6 losses (no grad)", t_fwd)
t_grad = loop_time(grad_step, jnp.float32(0.0), (variables, batch), iters=N)
report("value_and_grad (no optimizer)", t_grad)

# full step carries the TrainState through the loop (bench.py pattern)
t_full = {}
for stage in ("heads", "all"):
    tx = make_optimizer(variables, stage, config.learning_rate)
    state0 = TrainState(variables, tx.init(variables),
                        jnp.zeros((), jnp.int32))
    step_fn = make_train_step(
        model, config, tx, trainable=trainable_mask(variables, stage))

    @jax.jit
    def run(state, k, data):
        def body(_, carry):
            st, kk, acc = carry
            kk, sub = jax.random.split(kk)
            st, losses = step_fn(st, sub, data)
            return (st, kk, acc + losses["total"])
        st, _, acc = jax.lax.fori_loop(0, N, body, (state, key, 0.0))
        return acc + sum(jnp.sum(v).astype(jnp.float32) * 1e-20
                         for v in jax.tree_util.tree_leaves(st.params))

    run(state0, key, batch).block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    run(state0, key, batch).block_until_ready()
    t_full[stage] = (time.perf_counter() - t0) / N
    report(f"full step ({stage}-stage optimizer)", t_full[stage])

print()
report("  => full backward (grad - fwd)", t_grad - t_fwd)
report("  => heads bwd+optimizer (heads - fwd)", t_full["heads"] - t_fwd)
report("  => optimizer+clip all (all - grad)", t_full["all"] - t_grad)

# the frozen pieces inside the forward
images = batch["images"]


def glm_step(acc, v, im):
    out = model.apply(v, im + acc * 0,
                      method=lambda m, x: m._glm_prior(x, need_label=False))
    return acc + sum(jnp.sum(t).astype(jnp.float32)
                     for t in jax.tree_util.tree_leaves(out))


def fpn_step(acc, v, im):
    out = model.apply(v, im + acc * 0, method=lambda m, x: m.fpn(x))
    return acc + sum(jnp.sum(t).astype(jnp.float32)
                     for t in jax.tree_util.tree_leaves(out))


report("glm prior (frozen, fwd-only)",
       loop_time(glm_step, jnp.float32(0.0), (variables, images), iters=N))
report("resnet101-fpn (fwd-only)",
       loop_time(fpn_step, jnp.float32(0.0), (variables, images), iters=N))
