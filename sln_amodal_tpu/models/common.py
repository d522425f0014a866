"""Shared model building blocks (flax.linen, NHWC, TPU-native).

Numerical conventions deliberately match the reference's torch graphs so that
converted weights reproduce activations:

- convolutions use torch-style *symmetric* explicit padding where the
  reference uses torch padding, and TF-"SAME"-style padding where the
  reference uses its ``SamePad2d`` shim (``/root/reference/modal/modals.py:159-184``
  — for stride 1 / odd kernels the two coincide);
- batch norm is **frozen** everywhere, exactly like the live reference path
  (``/root/reference/model.py:192-197,526-531``): stored running statistics
  applied as a scale/shift. Frozen-BN parameters live under names containing
  ``frozen_bn`` and are excluded from every optimizer stage.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """Inference-mode batch norm: y = gamma * (x - mean) / sqrt(var + eps) + beta.

    The four arrays are stored as params for checkpoint fidelity but are
    masked out of all optimizers (see train/optim.py).
    """

    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (dim,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (dim,), jnp.float32)
        inv = gamma * jax.lax.rsqrt(var + self.epsilon)
        scale = inv.astype(x.dtype)
        shift = (beta - mean * inv).astype(x.dtype)
        return x * scale + shift


class ConvParams(nn.Module):
    """Parameter container with nn.Conv's exact tree ({kernel[, bias]}),
    layout ([kh, kw, in, out]) and initializers — for layers whose compute
    is reformulated away from XLA's conv lowering (matmul forms below) while
    converted torch checkpoints keep loading unchanged."""

    kh: int
    kw: int
    cin: int
    cout: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kh, self.kw, self.cin, self.cout), jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.cout,), jnp.float32)
            if self.use_bias else None
        )
        return k, b


class FullKernelConv(nn.Module):
    """``nn.Conv(features, (p, p), padding='VALID')`` applied to a p×p input
    — i.e. the kernel covers the whole input — is one [N, p·p·Cin] x
    [p·p·Cin, features] matmul. XLA's conv lowering runs this shape at
    ~10 TFLOP/s on v5e (the classifier head's k=7 conv); the explicit matmul
    form hits the MXU. Bit-compatible param tree with nn.Conv."""

    features: int
    kernel: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, cin = x.shape
        kh, kw = self.kernel
        assert (h, w) == (kh, kw), (x.shape, self.kernel)
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        # flatten order (kh, kw, cin) matches NHWC x HWIO im2col exactly
        y = x.reshape(n, kh * kw * cin).astype(self.dtype) @ (
            k.reshape(kh * kw * cin, self.features).astype(self.dtype)
        )
        y = y + b.astype(self.dtype)
        return y.reshape(n, 1, 1, self.features)


class DepthToSpaceDeconv(nn.Module):
    """``nn.ConvTranspose(features, (2, 2), strides=(2, 2), 'VALID')`` as a
    pointwise matmul + depth-to-space: out[2i+u, 2j+v] = x[i,j] @ K[u,v]
    (non-overlapping stride-2 taps). Avoids XLA's input-dilated
    conv-transpose lowering in the mask head; identical param tree and
    numerics (pinned by tests/test_matmul_layers.py)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, cin = x.shape
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (2, 2, cin, self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        # flax ConvTranspose applies the kernel spatially FLIPPED; then
        # [2,2,cin,out] -> [cin, 2*2*out] so one matmul emits all 4 subpixels
        kmat = jnp.transpose(k[::-1, ::-1], (2, 0, 1, 3)).reshape(
            cin, 4 * self.features
        )
        y = x.astype(self.dtype) @ kmat.astype(self.dtype)   # [n,h,w,4*out]
        y = y.reshape(n, h, w, 2, 2, self.features)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
            n, 2 * h, 2 * w, self.features
        )
        return y + b.astype(self.dtype)


def same_pad_amounts(size: int, kernel: int, stride: int) -> Tuple[int, int]:
    """TF-'SAME' pad (before, after) for one spatial dim — the rule the
    reference's SamePad2d implements (modals.py:168-181)."""
    out = math.ceil(size / stride)
    pad = max((out - 1) * stride + kernel - size, 0)
    before = pad // 2
    return before, pad - before


def max_pool_torch(
    x: jnp.ndarray, kernel: int, stride: int, padding: int, ceil_mode: bool = False
) -> jnp.ndarray:
    """torch-semantics 2-D max pool on NHWC, incl. ceil_mode.

    torch output size: floor-or-ceil((S + 2p - k)/s) + 1, with the ceil-mode
    constraint that the last window must start inside input+left-pad.
    """
    _, h, w, _ = x.shape

    def out_size(s):
        v = (s + 2 * padding - kernel) / stride
        o = math.ceil(v) + 1 if ceil_mode else math.floor(v) + 1
        if ceil_mode and (o - 1) * stride >= s + padding:
            o -= 1
        return o

    oh, ow = out_size(h), out_size(w)
    need_h = (oh - 1) * stride + kernel
    need_w = (ow - 1) * stride + kernel
    pad_h = (padding, max(need_h - h - padding, 0))
    pad_w = (padding, max(need_w - w - padding, 0))
    # init_value must be a static scalar: a traced array prevents XLA from
    # recognizing the reduce-max pattern (breaks reverse-mode autodiff).
    neg = -float("inf") if jnp.issubdtype(x.dtype, jnp.floating) else int(jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), pad_h, pad_w, (0, 0)),
    )


def max_pool_same(x: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    """Max pool with TF-'SAME' padding (= reference SamePad2d + valid pool)."""
    _, h, w, _ = x.shape
    pad_h = same_pad_amounts(h, kernel, stride)
    pad_w = same_pad_amounts(w, kernel, stride)
    # init_value must be a static scalar: a traced array prevents XLA from
    # recognizing the reduce-max pattern (breaks reverse-mode autodiff).
    neg = -float("inf") if jnp.issubdtype(x.dtype, jnp.floating) else int(jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), pad_h, pad_w, (0, 0)),
    )


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample (torch F.upsample default mode)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def _resize_matrix(n_in: int, n_out: int):
    """Row-stochastic interpolation matrix [n_out, n_in] with torch
    ``F.interpolate(mode='bilinear', align_corners=False)`` weights:
    src = max((i + 0.5) * n_in / n_out - 0.5, 0), two-tap linear."""
    import numpy as np

    scale = n_in / n_out
    i = np.arange(n_out)
    src = np.maximum((i + 0.5) * scale - 0.5, 0.0)
    i0 = np.minimum(np.floor(src).astype(np.int64), n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    w = src - i0
    mat = np.zeros((n_out, n_in), np.float64)
    mat[i, i0] += 1.0 - w
    mat[i, i1] += w
    return mat


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers — exact torch
    ``align_corners=False`` semantics for BOTH up- and downscale.

    Implemented as two separable matmuls (MXU-friendly): unlike
    ``jax.image.resize``, which antialiases on downscale (diverging from
    torch — the reference's GLM input path downscales 1024->513 and the MSC
    scales downscale again, ``model.py:535``/``msc_deeplab.py:25``), and
    which lowers to a slow gather chain on this platform (~39 ms for the
    65->1024 global-label upsample vs <1 ms as matmuls).
    """
    h, w = x.shape[1:3]
    oh, ow = size
    dtype = x.dtype
    # f32 interpolation, except: f64 inputs keep f64 (x64 parity testing)
    # and bf16 inputs keep bf16. The bf16 path rounds the interpolation
    # weights themselves to bf16 (~2^-9 relative) on top of the data
    # rounding — MXU accumulation is f32, but the result is NOT f32-exact;
    # drift vs the f32 path is bf16-rounding magnitude (pinned by
    # tests/test_resize.py::test_bf16_resize_drift). The GLM input path
    # accepts this for the speed: 1.5 ms -> ~0.4 ms on v5e.
    if x.dtype == jnp.dtype("float64"):
        cdtype = jnp.float64
    elif x.dtype == jnp.bfloat16:
        cdtype = jnp.bfloat16
    else:
        cdtype = jnp.float32
    y = x.astype(cdtype)
    if oh != h:
        y = jnp.einsum(
            "oh,bhwc->bowc", jnp.asarray(_resize_matrix(h, oh), cdtype), y
        )
    if ow != w:
        y = jnp.einsum(
            "pw,bhwc->bhpc", jnp.asarray(_resize_matrix(w, ow), cdtype), y
        )
    return y.astype(dtype)


def resize_bilinear_2d(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """:func:`resize_bilinear` for a channel-less [B, H, W] map.

    Same separable half-pixel matmuls and dtype rules; keeps the WIDE
    spatial axis minor instead of a 1-wide channel axis — resizing a
    [B, H, W, 1] map through the 4-D path puts that single channel in the
    128-lane dimension (1/128 utilization). Used for the GLM's full-res
    argmax-label upsample."""
    h, w = x.shape[1:3]
    oh, ow = size
    dtype = x.dtype
    if x.dtype == jnp.dtype("float64"):
        cdtype = jnp.float64
    elif x.dtype == jnp.bfloat16:
        cdtype = jnp.bfloat16
    else:
        cdtype = jnp.float32
    y = x.astype(cdtype)
    if oh != h:
        y = jnp.einsum("oh,bhw->bow", jnp.asarray(_resize_matrix(h, oh), cdtype), y)
    if ow != w:
        y = jnp.einsum("pw,bhw->bhp", jnp.asarray(_resize_matrix(w, ow), cdtype), y)
    return y.astype(dtype)


def subsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 subsample = the reference's MaxPool2d(kernel=1, stride=2)
    used for FPN P6 (modals.py:212)."""
    return x[:, ::2, ::2, :]
