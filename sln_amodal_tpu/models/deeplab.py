"""DeepLabV2-ResNet101-MSC "GLM" global semantic prior (flax.linen, NHWC).

The frozen semantic-segmentation network whose per-pixel class posterior
feeds the layer-mask head. Architecture per the reference
(``/root/reference/modal/deeplabv2.py``, ``msc_deeplab.py``,
``resnet_deeplab.py``):

- dilated ResNet-101, output stride 8 (layer4 dilation 2, layer5 dilation 4);
- ASPP: sum of four 3x3 convs at atrous rates 6/12/18/24 (bias=True);
- multi-scale inference at scales (1.0, 0.5, 0.75), logits bilinearly resized
  (align_corners=False) to the full-scale logit grid and fused by pixel max.

The module is always run frozen/eval (reference ``model.py:537``); all BN is
FrozenBatchNorm with eps 1e-5.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import (
    ConvParams,
    FrozenBatchNorm,
    max_pool_torch,
    resize_bilinear,
)


def dilated3x3_space_to_batch(x, kernel, rate: int):
    """3x3 atrous conv (stride 1, padding == rate) as ONE dense 3x3 conv
    over the ``rate**2`` subgrids: a dilation-r conv is exactly a dense conv
    on each r-strided subgrid, and per-subgrid zero padding 1 reproduces the
    original padding-r semantics (out[i] reads x[i±r], which lives at
    position a±1 of the same subgrid, zero outside).

    The fix for XLA's dilated lowering on TPU: the trunk's dilation-2/4
    convs (layer4/layer5) ran at ~13% MXU as ``kernel_dilation`` convs but
    ~45% as this dense-conv reshape (scripts/profile_dilated.py).
    """
    b, h, w, c = x.shape
    r = rate
    co = kernel.shape[-1]
    hp, wp = -(-h // r) * r, -(-w // r) * r
    xp = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    xs = (xp.reshape(b, hp // r, r, wp // r, r, c)
          .transpose(0, 2, 4, 1, 3, 5)
          .reshape(b * r * r, hp // r, wp // r, c))
    ys = jax.lax.conv_general_dilated(
        xs, kernel.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = (ys.reshape(b, r, r, hp // r, wp // r, co)
         .transpose(0, 3, 1, 4, 2, 5)
         .reshape(b, hp, wp, co))
    return y[:, :h, :w]


def dilated3x3_tap_matmul(x, kernel, rate: int):
    """3x3 atrous conv (stride 1, padding == rate) as one [BHW, Cin] x
    [Cin, 9*Cout] matmul + 9 statically shifted f32 plane accumulations —
    the ASPP lowering at a single rate. All FLOPs land on the MXU; costs
    a 9x-materialized tap tensor (fine for the 65^2 grids)."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    w_all = jnp.transpose(kernel, (2, 0, 1, 3)).reshape(cin, 9 * cout)
    y = jnp.einsum("bhwi,io->bhwo", x, w_all.astype(x.dtype))
    y = y.reshape(b, h, w, 9, cout)
    acc_t = jnp.promote_types(jnp.float32, x.dtype)
    acc = jnp.zeros((b, h, w, cout), acc_t)
    t = 0
    for u in range(3):
        for v in range(3):
            dy, dx = (u - 1) * rate, (v - 1) * rate
            i0, i1 = max(0, -dy), min(h, h - dy)
            j0, j1 = max(0, -dx), min(w, w - dx)
            if i0 < i1 and j0 < j1:
                sl = y[:, i0 + dy:i1 + dy, j0 + dx:j1 + dx, t, :].astype(acc_t)
                acc = acc + jax.lax.pad(
                    sl, jnp.zeros((), acc_t),
                    [(0, 0, 0), (i0, h - i1, 0), (j0, w - j1, 0), (0, 0, 0)])
            t += 1
    return acc.astype(x.dtype)


class ConvBN(nn.Module):
    """conv + frozen BN (+relu). ``dilated_lowering`` picks the lowering of
    3x3 dilated convs ('conv' = XLA kernel_dilation, 's2b' = space-to-batch
    dense conv, 'tapmm' = tap matmul); all three are the same math modulo
    f32 summation order, and share nn.Conv's param tree so checkpoints are
    unaffected."""

    out_ch: int
    kernel: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    relu: bool = True
    dtype: jnp.dtype = jnp.float32
    dilated_lowering: str = "conv"

    @nn.compact
    def __call__(self, x):
        use_alt = (
            self.dilated_lowering != "conv"
            and self.dilation > 1
            and self.kernel == 3
            and self.stride == 1
            and self.padding == self.dilation
        )
        if use_alt:
            k, _ = ConvParams(
                3, 3, x.shape[-1], self.out_ch, use_bias=False, name="conv")()
            fn = (dilated3x3_space_to_batch if self.dilated_lowering == "s2b"
                  else dilated3x3_tap_matmul)
            y = fn(x.astype(self.dtype), k.astype(self.dtype), self.dilation)
        else:
            y = nn.Conv(
                self.out_ch,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=[(self.padding, self.padding)] * 2,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        y = FrozenBatchNorm(epsilon=1e-5, name="frozen_bn")(y)
        return nn.relu(y) if self.relu else y


class DLBottleneck(nn.Module):
    out_ch: int
    stride: int
    dilation: int
    downsample: bool
    dtype: jnp.dtype = jnp.float32
    dilated_lowering: str = "conv"

    @nn.compact
    def __call__(self, x):
        mid = self.out_ch // 4
        h = ConvBN(mid, 1, self.stride, 0, 1, True, self.dtype, name="reduce")(x)
        h = ConvBN(mid, 3, 1, self.dilation, self.dilation, True, self.dtype,
                   dilated_lowering=self.dilated_lowering, name="conv3x3")(h)
        h = ConvBN(self.out_ch, 1, 1, 0, 1, False, self.dtype, name="increase")(h)
        if self.downsample:
            sc = ConvBN(self.out_ch, 1, self.stride, 0, 1, False, self.dtype,
                        name="shortcut")(x)
        else:
            sc = x
        return nn.relu(h + sc)


class DLResLayer(nn.Module):
    n_layers: int
    out_ch: int
    stride: int
    dilation: int
    dtype: jnp.dtype = jnp.float32
    dilated_lowering: str = "conv"

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_layers):
            x = DLBottleneck(
                self.out_ch,
                stride=self.stride if i == 0 else 1,
                dilation=self.dilation,
                downsample=(i == 0),
                dtype=self.dtype,
                dilated_lowering=self.dilated_lowering,
                name=f"block{i + 1}",
            )(x)
        return x


class ASPP(nn.Module):
    """Sum of four 3x3 atrous convs at rates 6/12/18/24 (bias=True), the
    reference's ``_ASPP`` head (``resnet_deeplab.py``).

    TPU-native formulation: XLA's dilated-conv lowering is the single
    hottest op of the whole GLM (7.2 ms for [1,65,65,2048]->182 bf16 on
    v5e — ~74% of the 513² base forward). Instead, all 4x9 kernel taps are
    evaluated as ONE [HW, Cin] x [Cin, 36*Cout] matmul (ideal MXU shape),
    and each tap's plane is then shifted into place by its static atrous
    offset and accumulated in f32 — zero contributions outside the frame
    reproduce torch Conv2d zero padding exactly. Differs from the conv
    lowering only in floating-point summation order.
    """

    n_classes: int
    rates: Sequence[int] = (6, 12, 18, 24)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin, cout = x.shape[-1], self.n_classes
        b, h, w = x.shape[:3]
        # accumulate in f32 (or f64 under x64 parity testing)
        acc_t = jnp.promote_types(jnp.float32, self.dtype)
        taps = []      # ([Cin, Cout] f32 kernel plane, (dy, dx)) per tap
        bias_sum = jnp.zeros((cout,), acc_t)
        for i, r in enumerate(self.rates):
            k, bi = ConvParams(3, 3, cin, cout, name=f"c{i}")()
            bias_sum = bias_sum + bi.astype(acc_t)
            for u in range(3):
                for v in range(3):
                    taps.append((k[u, v], ((u - 1) * r, (v - 1) * r)))

        w_all = jnp.stack([k for k, _ in taps], axis=1)      # [Cin, T, Cout]
        w_all = w_all.reshape(cin, -1).astype(self.dtype)    # [Cin, T*Cout]
        y = jnp.einsum("bhwi,io->bhwo", x.astype(self.dtype), w_all)
        y = y.reshape(b, h, w, len(taps), cout)

        # out[i,j] = sum_t y[i+dy_t, j+dx_t, t] with zeros outside the frame
        acc = jnp.broadcast_to(bias_sum, (b, h, w, cout))
        for t, (_, (dy, dx)) in enumerate(taps):
            i0, i1 = max(0, -dy), min(h, h - dy)
            j0, j1 = max(0, -dx), min(w, w - dx)
            if i0 >= i1 or j0 >= j1:
                continue  # tap reads entirely outside the frame (tiny grids)
            sl = y[:, i0 + dy:i1 + dy, j0 + dx:j1 + dx, t, :].astype(acc_t)
            acc = acc + jax.lax.pad(
                sl, jnp.zeros((), acc_t),
                [(0, 0, 0), (i0, h - i1, 0), (j0, w - j1, 0), (0, 0, 0)],
            )
        return acc.astype(self.dtype)


class DeepLabV2(nn.Module):
    n_classes: int = 182
    n_blocks: Tuple[int, ...] = (3, 4, 23, 3)
    dtype: jnp.dtype = jnp.float32
    dilated_lowering: str = "conv"

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        # stem: conv7 s2 pad3 + BN + relu + maxpool k3 s2 pad1 ceil_mode
        y = ConvBN(64, 7, 2, 3, 1, True, self.dtype, name="stem")(x)
        y = max_pool_torch(y, kernel=3, stride=2, padding=1, ceil_mode=True)
        y = DLResLayer(self.n_blocks[0], 256, 1, 1, self.dtype, name="layer2")(y)
        y = DLResLayer(self.n_blocks[1], 512, 2, 1, self.dtype, name="layer3")(y)
        y = DLResLayer(self.n_blocks[2], 1024, 1, 2, self.dtype,
                       dilated_lowering=self.dilated_lowering, name="layer4")(y)
        y = DLResLayer(self.n_blocks[3], 2048, 1, 4, self.dtype,
                       dilated_lowering=self.dilated_lowering, name="layer5")(y)
        return ASPP(self.n_classes, dtype=self.dtype, name="aspp")(y)


class DeepLabV2MSC(nn.Module):
    """Multi-scale fusion wrapper (inference semantics only — the GLM is
    always frozen)."""

    n_classes: int = 182
    scales: Tuple[float, ...] = (0.5, 0.75)
    dtype: jnp.dtype = jnp.float32
    dilated_lowering: str = "conv"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        base = DeepLabV2(self.n_classes, dtype=self.dtype,
                         dilated_lowering=self.dilated_lowering, name="base")
        logits = base(x)
        out_hw = logits.shape[1:3]
        fused = logits.astype(jnp.float32)
        h, w = x.shape[1:3]
        for p in self.scales:
            xs = resize_bilinear(x, (int(h * p), int(w * p)))
            ls = base(xs)
            fused = jnp.maximum(fused, resize_bilinear(ls, out_hw).astype(jnp.float32))
        return fused
