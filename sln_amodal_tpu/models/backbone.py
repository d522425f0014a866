"""ResNet-101 backbone + FPN neck (flax.linen, NHWC).

Architecture matches the reference's Matterport-style graph
(``/root/reference/modal/modals.py:159-357``) so converted torch weights
reproduce activations:

- Bottleneck places the stride on the **1x1** conv (Matterport quirk,
  modals.py:269) rather than the 3x3;
- 3x3 convs use TF-'SAME' style padding (SamePad2d + valid conv);
- the stem conv uses torch symmetric padding 3;
- all BN is frozen (FrozenBatchNorm), eps 1e-3;
- FPN: lateral 1x1 + nearest 2x top-down + 3x3 smooth; P6 = stride-2
  subsample of P5 (modals.py:203-257).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import FrozenBatchNorm, max_pool_same, subsample_2x, upsample_nearest_2x

RESNET_BLOCKS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(
            self.planes, (1, 1), strides=(self.stride, self.stride),
            padding="VALID", dtype=self.dtype, name="conv1",
        )(x)
        y = FrozenBatchNorm(name="frozen_bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
            name="conv2",
        )(y)
        y = FrozenBatchNorm(name="frozen_bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes * 4, (1, 1), padding="VALID", dtype=self.dtype, name="conv3"
        )(y)
        y = FrozenBatchNorm(name="frozen_bn3")(y)
        if self.downsample:
            residual = nn.Conv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                padding="VALID", dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = FrozenBatchNorm(name="downsample_frozen_bn")(residual)
        return nn.relu(y + residual)


class ResNetStage(nn.Module):
    planes: int
    blocks: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        needs_ds = self.stride != 1 or x.shape[-1] != self.planes * 4
        x = Bottleneck(
            self.planes, self.stride, downsample=needs_ds, dtype=self.dtype,
            name="block0",
        )(x)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, dtype=self.dtype, name=f"block{i}")(x)
        return x


class ResNetFPN(nn.Module):
    """Backbone + neck; returns (P2, P3, P4, P5, P6), each [B, H/s, W/s, C]."""

    architecture: str = "resnet101"
    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        blocks = RESNET_BLOCKS[self.architecture]

        # --- C1 stem: conv7 s2 pad3 (torch symmetric) + BN + relu +
        #     SAME-pad maxpool k3 s2
        x = x.astype(self.dtype)
        y = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            dtype=self.dtype, name="stem_conv",
        )(x)
        y = FrozenBatchNorm(name="stem_frozen_bn")(y)
        y = nn.relu(y)
        y = max_pool_same(y, kernel=3, stride=2)

        c2 = ResNetStage(64, blocks[0], 1, self.dtype, name="layer2")(y)
        c3 = ResNetStage(128, blocks[1], 2, self.dtype, name="layer3")(c2)
        c4 = ResNetStage(256, blocks[2], 2, self.dtype, name="layer4")(c3)
        c5 = ResNetStage(512, blocks[3], 2, self.dtype, name="layer5")(c4)

        # --- FPN top-down
        p5 = nn.Conv(self.out_channels, (1, 1), padding="VALID", dtype=self.dtype,
                     name="p5_lateral")(c5)
        p4 = nn.Conv(self.out_channels, (1, 1), padding="VALID", dtype=self.dtype,
                     name="p4_lateral")(c4) + upsample_nearest_2x(p5)
        p3 = nn.Conv(self.out_channels, (1, 1), padding="VALID", dtype=self.dtype,
                     name="p3_lateral")(c3) + upsample_nearest_2x(p4)
        p2 = nn.Conv(self.out_channels, (1, 1), padding="VALID", dtype=self.dtype,
                     name="p2_lateral")(c2) + upsample_nearest_2x(p3)

        p5 = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                     dtype=self.dtype, name="p5_smooth")(p5)
        p4 = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                     dtype=self.dtype, name="p4_smooth")(p4)
        p3 = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                     dtype=self.dtype, name="p3_smooth")(p3)
        p2 = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                     dtype=self.dtype, name="p2_smooth")(p2)

        p6 = subsample_2x(p5)
        return p2, p3, p4, p5, p6
