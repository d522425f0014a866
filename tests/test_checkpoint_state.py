"""Full train-state checkpoint/resume + profiling utils tests."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from sln_amodal_tpu.train import checkpoint as ckpt
from sln_amodal_tpu.train.trainer import TrainState
from sln_amodal_tpu.utils.profiling import StepProfiler


def test_train_state_roundtrip(tmp_path):
    params = {"params": {"w": jnp.arange(4.0)}}
    tx = optax.sgd(0.1, momentum=0.9)
    state = TrainState(params, tx.init(params), jnp.asarray(7, jnp.int32))
    path = ckpt.save_train_state(state, str(tmp_path), "coco", 2)
    assert path.endswith(".state")
    restored = ckpt.restore_train_state(path, state)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(
        np.asarray(restored.params["params"]["w"]), np.arange(4.0)
    )


def test_step_profiler():
    p = StepProfiler(sync_every=2)
    x = jnp.ones((4,))
    for _ in range(6):
        p.step(x)
    s = p.summary()
    assert s["mean_step_s"] >= 0
    assert "steps_per_s" in s
