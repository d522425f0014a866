"""A/B microbench of 3x3 *dilated*-conv lowerings at the GLM's hot shapes.

The GLM trunk (DeepLabV2, OS8) runs 23 blocks of 3x3 dilation-2 conv at
256ch and 3 blocks of 3x3 dilation-4 at 512ch on the 65^2 grid
(sln_amodal_tpu/models/deeplab.py layer4/layer5) — per the round-3 roofline
these dominate GLM time, and the ASPP's rates-6..24 dilated convs measured
~6x slower under XLA's dilated lowering than a matmul reformulation.
This script times, per shape:

  xla-dilated : lax.conv_general_dilated with kernel_dilation=r (status quo)
  space2batch : split into r^2 subgrids -> ONE dense 3x3 conv at batch b*r^2
                (a dilated conv is exactly a dense conv on each r-strided
                subgrid; zero-pad semantics match padding=r)
  tap-matmul  : one [BHW, Cin] x [Cin, 9*Cout] matmul + 9 static shifted
                plane accumulations (the ASPP lowering, single-rate)

Run from the repo root on the real TPU: ``python scripts/profile_dilated.py``.
Methodology: utils/benchmark.loop_time (in-graph fori_loop, two-point).
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sln_amodal_tpu.utils.runtime import setup_runtime

setup_runtime()

from sln_amodal_tpu.utils.benchmark import loop_time

DT = jnp.bfloat16


def conv_xla(x, k, r):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), [(r, r), (r, r)],
        rhs_dilation=(r, r), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_s2b(x, k, r):
    b, h, w, c = x.shape
    co = k.shape[-1]
    hp, wp = -(-h // r) * r, -(-w // r) * r
    xp = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    xs = (xp.reshape(b, hp // r, r, wp // r, r, c)
          .transpose(0, 2, 4, 1, 3, 5)
          .reshape(b * r * r, hp // r, wp // r, c))
    ys = jax.lax.conv_general_dilated(
        xs, k.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = (ys.reshape(b, r, r, hp // r, wp // r, co)
         .transpose(0, 3, 1, 4, 2, 5)
         .reshape(b, hp, wp, co))
    return y[:, :h, :w]


def conv_tapmm(x, k, r):
    b, h, w, cin = x.shape
    cout = k.shape[-1]
    w_all = jnp.transpose(k, (2, 0, 1, 3)).reshape(cin, 9 * cout)
    y = jnp.einsum("bhwi,io->bhwo", x, w_all.astype(x.dtype))
    y = y.reshape(b, h, w, 9, cout)
    acc = jnp.zeros((b, h, w, cout), jnp.float32)
    t = 0
    for u in range(3):
        for v in range(3):
            dy, dx = (u - 1) * r, (v - 1) * r
            i0, i1 = max(0, -dy), min(h, h - dy)
            j0, j1 = max(0, -dx), min(w, w - dx)
            sl = y[:, i0 + dy:i1 + dy, j0 + dx:j1 + dx, t, :].astype(jnp.float32)
            acc = acc + jax.lax.pad(
                sl, jnp.zeros((), jnp.float32),
                [(0, 0, 0), (i0, h - i1, 0), (j0, w - j1, 0), (0, 0, 0)])
            t += 1
    return acc.astype(x.dtype)


VARIANTS = {"xla-dilated": conv_xla, "space2batch": conv_s2b,
            "tap-matmul": conv_tapmm}

# (grid, cin, cout, rate, blocks-at-this-shape in the 3-scale MSC).
# Full-scale shapes only by default: on days when the remote-compile
# service is slow every NEW program costs minutes, and the full-scale grid
# carries ~55% of the MSC FLOPs; pass "all" to also time the 0.75/0.5-scale
# grids.
SHAPES = [
    (65, 256, 256, 2, 23),   # layer4 @ scale 1.0
    (65, 512, 512, 4, 3),    # layer5 @ scale 1.0
]
if len(sys.argv) > 1 and sys.argv[1] == "all":
    SHAPES += [
        (49, 256, 256, 2, 23),   # layer4 @ scale 0.75
        (49, 512, 512, 4, 3),
        (33, 256, 256, 2, 23),   # layer4 @ scale 0.5
        (33, 512, 512, 4, 3),
    ]

B = 8
rng = np.random.RandomState(0)

# numeric agreement check — on the CPU backend (eager TPU dispatches each
# pay a remote compile; the check only needs math, not the device)
with jax.default_device(jax.devices("cpu")[0]):
    xs = jnp.asarray(rng.randn(2, 33, 33, 64).astype(np.float32))
    ks = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.1)
    for r in (2, 4):
        ref = np.asarray(conv_xla(xs, ks, r))
        for name, fn in VARIANTS.items():
            got = np.asarray(fn(xs, ks, r))
            err = np.abs(got - ref).max()
            assert err < 1e-3, (name, r, err)
print("numeric agreement OK", flush=True)

print(f"batch={B}; per-op times (x blocks = est. contribution/batch)",
      flush=True)
dev = jax.devices()[0]
for g, cin, cout, r, nblocks in SHAPES:
    # build on CPU, device_put to the TPU — eager casts on the tunneled
    # platform each pay a remote compile
    with jax.default_device(jax.devices("cpu")[0]):
        x_h = jnp.asarray(rng.randn(B, g, g, cin).astype(np.float32)).astype(DT)
        k_h = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.05)
    x, k = jax.device_put(x_h, dev), jax.device_put(k_h, dev)
    flops = B * g * g * cin * cout * 9 * 2
    for name, fn in VARIANTS.items():
        dt = loop_time(lambda xx, kk, rr=r, f=fn: f(xx, kk, rr),
                       x, (k,), iters=30)
        eff = flops / dt / 197e12 * 100
        print(f"  {g:3d}^2 cin={cin:4d} r={r} {name:12s} "
              f"{dt * 1e3:7.3f} ms  ({eff:5.1f}% MXU)  "
              f"x{nblocks} = {dt * nblocks * 1e3:7.1f} ms", flush=True)
