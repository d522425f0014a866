"""Where does the RPN stage's time go at b8? (prefix delta: +2.75 ms/img,
~38% MXU against its ~1.65 TFLOP/batch roofline.)

Times the shared RPN head on P2 alone (75% of the FLOPs, one big conv)
vs the small levels P3..P6 together vs all levels — if the small levels
dominate wall-clock, packing them into one height-concatenated conv is the
fix; if P2 itself runs at ~38%, the conv shape is the problem.

Run from the repo root on the real TPU: ``python scripts/profile_rpn.py``.
"""
import sys

sys.path.insert(0, ".")

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8

import jax
import jax.numpy as jnp
import numpy as np

from sln_amodal_tpu.utils.runtime import setup_runtime

setup_runtime()

from sln_amodal_tpu.config import inference_config
from sln_amodal_tpu.models.heads import RPNHead
from sln_amodal_tpu.utils.benchmark import loop_time

config = inference_config(compute_dtype="bfloat16")
DT = jnp.bfloat16
rng = np.random.RandomState(0)
cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]


def put(a):
    with jax.default_device(cpu):
        h = jnp.asarray(a).astype(DT)
    return jax.device_put(h, dev)


s = config.image_size
sizes = [s // 4, s // 8, s // 16, s // 32, s // 64]
feats = tuple(
    put(rng.randn(BATCH, n, n, config.fpn_channels).astype(np.float32))
    for n in sizes)

rpn = RPNHead(len(config.rpn_anchor_ratios), config.rpn_anchor_stride,
              dtype=DT)
rv = rpn.init(jax.random.PRNGKey(0), feats[-1])

N = 20


def run_levels(idx):
    def f(x0, v, rest):
        outs = [rpn.apply(v, p) for p in (x0,) + rest]
        return sum(jnp.sum(o[1]).astype(jnp.float32) for o in outs)
    return f


def report(name, dt, flops):
    print(f"{name:18s} {dt * 1e3:8.3f} ms/batch ({dt / BATCH * 1e3:7.3f} "
          f"ms/img, {flops / dt / 197e12 * 100:5.1f}% MXU)", flush=True)


def flops_for(levels):
    total = 0
    for i in levels:
        n = sizes[i]
        total += BATCH * n * n * (
            config.fpn_channels * 512 * 9 + 512 * 18) * 2
    return total


dt = loop_time(run_levels([0]), feats[0], (rv, ()), iters=N)
report("rpn P2 only", dt, flops_for([0]))
dt = loop_time(run_levels([1, 2, 3, 4]), feats[1], (rv, feats[2:]), iters=N)
report("rpn P3..P6", dt, flops_for([1, 2, 3, 4]))
dt = loop_time(run_levels(list(range(5))), feats[0], (rv, feats[1:]), iters=N)
report("rpn all levels", dt, flops_for(range(5)))
