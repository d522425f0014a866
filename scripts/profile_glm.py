"""Fine-grained timing of the GLM (DeepLabV2-MSC) on the real TPU.

Breaks the 3-scale MSC forward into stages (per-scale base forwards, stem /
res-layers / ASPP at full scale, input resize, fusion) and A/B-tests
alternative formulations of the hot ops (the library's fused-matmul ASPP
vs a 9-shift-matmul variant; the original XLA dilated-conv lowering
measured 7.2 ms before the ASPP rewrite). Methodology identical to
bench.py: one compiled
``lax.fori_loop`` per stage, data-dependent carry, params as arguments.

Run from the repo root (never concurrently with another TPU process):
``python scripts/profile_glm.py``.
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
from sln_amodal_tpu.models.common import resize_bilinear
from sln_amodal_tpu.models.deeplab import ASPP, DeepLabV2, DeepLabV2MSC
from sln_amodal_tpu.models.sln import SLNAmodal, init_params

config = inference_config(compute_dtype="bfloat16")
model = SLNAmodal(config)
variables = init_params(config, jax.random.PRNGKey(0))
glm_params = {"params": variables["params"]["glm"]}
base_params = {"params": variables["params"]["glm"]["base"]}

DT = jnp.bfloat16
base = DeepLabV2(config.glm_num_classes, dtype=DT)
msc = DeepLabV2MSC(config.glm_num_classes, scales=config.glm_scales, dtype=DT)

g = config.glm_input_size  # 513
rng = np.random.RandomState(0)
x513 = jnp.asarray(rng.uniform(-120, 130, (1, g, g, 3)).astype(np.float32))
x1024 = jnp.asarray(
    rng.uniform(-120, 130, (1, 1024, 1024, 3)).astype(np.float32))

N = 20


from sln_amodal_tpu.utils.benchmark import loop_time as _loop_time  # noqa: E402


def scalar(tree):
    return sum(jnp.sum(v).astype(jnp.float32)
               for v in jax.tree_util.tree_leaves(tree))


def loop_time(name, step, x0, params, iters=N):
    dt = _loop_time(lambda x, v: step(v, x), x0, (params,), iters=iters)
    print(f"{name:40s} {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


# --- whole-GLM and per-scale base forwards -------------------------------
loop_time("MSC 3-scale (513+256+384)",
          lambda v, x: scalar(msc.apply(v, x)), x513, glm_params)
loop_time("base @513", lambda v, x: scalar(base.apply(v, x)),
          x513, base_params)
for p in config.glm_scales:
    s = int(g * p)
    loop_time(f"base @{s}",
              lambda v, x, s=s: scalar(
                  base.apply(v, resize_bilinear(x, (s, s)))),
              x513, base_params)

# --- stage split at full scale -------------------------------------------


def stem_to_layer4(v, x):
    """Everything up to the ASPP input."""
    import flax.linen as nn

    class Trunk(nn.Module):
        dtype: jnp.dtype = DT

        @nn.compact
        def __call__(self, x):
            from sln_amodal_tpu.models.common import max_pool_torch
            from sln_amodal_tpu.models.deeplab import ConvBN, DLResLayer
            x = x.astype(self.dtype)
            y = ConvBN(64, 7, 2, 3, 1, True, self.dtype, name="stem")(x)
            y = max_pool_torch(y, kernel=3, stride=2, padding=1,
                               ceil_mode=True)
            y = DLResLayer(3, 256, 1, 1, self.dtype, name="layer2")(y)
            y = DLResLayer(4, 512, 2, 1, self.dtype, name="layer3")(y)
            y = DLResLayer(23, 1024, 1, 2, self.dtype, name="layer4")(y)
            y = DLResLayer(3, 2048, 1, 4, self.dtype, name="layer5")(y)
            return y

    return Trunk().apply(v, x)


loop_time("trunk @513 (stem..layer5, no ASPP)",
          lambda v, x: scalar(stem_to_layer4(v, x)), x513, base_params)

# --- ASPP alone at the 65^2 grid -----------------------------------------
f65 = jnp.asarray(rng.randn(1, 65, 65, 2048).astype(np.float32)).astype(DT)
aspp = ASPP(config.glm_num_classes, dtype=DT)
aspp_params = {"params": base_params["params"]["aspp"]}
loop_time("ASPP (library impl, fused matmul) @65^2",
          lambda v, x: scalar(aspp.apply(v, x)), f65, aspp_params)


def aspp_shifted_matmul(v, x):
    """ASPP as 9 shifted pointwise matmuls per rate: a 3x3 dilated conv is
    sum_{dy,dx in {-r,0,r}} shift(x, dy, dx) @ W[dy,dx]. All FLOPs land in
    [HW, Cin] x [Cin, Cout] matmuls (MXU) instead of XLA's padded dilated
    conv."""
    p = v["params"]
    h, w = x.shape[1:3]
    rates = (6, 12, 18, 24)
    xf = x.reshape(-1, h, w, x.shape[-1])
    out = None
    for i, r in enumerate(rates):
        k = p[f"c{i}"]["kernel"].astype(x.dtype)   # [3,3,Cin,Cout]
        b = p[f"c{i}"]["bias"].astype(jnp.float32)
        acc = None
        for dy in (-r, 0, r):
            for dx in (-r, 0, r):
                ky, kx = dy // r + 1 if r else 1, dx // r + 1 if r else 1
                shifted = jnp.roll(xf, (-dy, -dx), axis=(1, 2))
                # zero the wrapped region (matches zero padding)
                ys = jnp.arange(h)[None, :, None, None]
                xs = jnp.arange(w)[None, None, :, None]
                mask_y = (ys + dy >= 0) & (ys + dy < h)
                mask_x = (xs + dx >= 0) & (xs + dx < w)
                shifted = shifted * (mask_y & mask_x).astype(x.dtype)
                c = jnp.einsum("bhwi,io->bhwo", shifted, k[ky, kx])
                acc = c if acc is None else acc + c
        acc = acc.astype(jnp.float32) + b
        out = acc if out is None else out + acc
    return out


loop_time("ASPP (9-shift matmul) @65^2",
          lambda v, x: scalar(aspp_shifted_matmul(v, x)), f65, aspp_params)

# --- misc ----------------------------------------------------------------
loop_time("resize 1024->513",
          lambda v, x: scalar(resize_bilinear(x, (g, g))), x1024, {})
