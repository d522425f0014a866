"""Stage-by-stage timing of the inference graph on the real TPU.

Run from the repo root: ``python scripts/profile_infer.py``.

Methodology (same as bench.py): each stage is wrapped in ONE compiled
``lax.fori_loop`` program with the next iteration's input data-dependent on
the previous output, and the final scalar fetched to host. Per-call host
dispatch on this platform pays a 3-60 ms tunnel RTT (decaying with process
warmup), so Python-loop-per-call timing wildly overstates device time;
``block_until_ready`` alone under-counts instead. Params are passed as
arguments — closing over them embeds them as HLO constants and overflows
the remote-compile request body (HTTP 413).
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sln_amodal_tpu.utils.runtime import setup_runtime

setup_runtime()

from sln_amodal_tpu.config import inference_config
from sln_amodal_tpu.models.sln import SLNAmodal, init_params

config = inference_config(compute_dtype="bfloat16")
model = SLNAmodal(config)
variables = init_params(config, jax.random.PRNGKey(0))

s = config.image_size
rng = np.random.RandomState(0)
images = jnp.asarray(rng.randn(1, s, s, 3).astype(np.float32))
windows = jnp.asarray([[0.0, 0.0, float(s), float(s)]], jnp.float32)

N = 20


def scalar(tree):
    return sum(jnp.sum(v).astype(jnp.float32)
               for v in jax.tree_util.tree_leaves(tree))


def loop_time(name, step):
    @jax.jit
    def run(x0, v):
        def body(_, x):
            return x + step(v, x).astype(x.dtype) * 0.0
        return jnp.sum(lax.fori_loop(0, N, body, x0))

    float(run(images, variables))  # compile + first run
    t0 = time.perf_counter()
    float(run(images, variables))
    dt = (time.perf_counter() - t0) / N
    print(f"{name:34s} {dt * 1e3:8.2f} ms/iter", flush=True)


loop_time("detect-only exact (with GLM)", lambda v, x: scalar(
    model.apply(v, x, windows, method=SLNAmodal.infer_detect_only)))

m_elide = SLNAmodal(config.replace(glm_elide_at_inference=True))
loop_time("detect-only elide-GLM", lambda v, x: scalar(
    m_elide.apply(v, x, windows, method=SLNAmodal.infer_detect_only)))

loop_time("full infer (incl. global label)", lambda v, x: scalar(
    model.apply(v, x, windows)))

loop_time("glm prior (MSC 1+0.5+0.75)", lambda v, x: scalar(
    model.apply(v, x, method=lambda m, im: m._glm_prior(im, need_label=False))[0]))

loop_time("resnet101-fpn", lambda v, x: scalar(
    model.apply(v, x, method=lambda m, im: m.fpn(im))))
