"""RPN, classifier and layer-mask heads (flax.linen, NHWC, per-image core).

Semantics follow the reference heads
(``/root/reference/modal/modals.py:361-499``) including:

- RPN anchor ordering (h, w, anchor) with per-anchor (bg, fg) channel pairs;
- classifier: pooled 7x7 → conv(k=7, VALID) 1024 → conv1x1 1024 → linear
  class / linear bbox (class-specific deltas);
- mask head consumes the GLM semantic prior **concatenated in front of** the
  FPN crop (modals.py:481: ``cat((cls_feature, x), 1)``) — 439 input channels
  by default — and emits ``num_classes`` layer-logit channels at 2x the pooled
  resolution via a 2x2-stride-2 transposed conv.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import (
    ConvParams,
    DepthToSpaceDeconv,
    FrozenBatchNorm,
    FullKernelConv,
)


class RPNHead(nn.Module):
    """Shared RPN head, applied per pyramid level.

    Returns (class_logits [B, HWA, 2], probs [B, HWA, 2], deltas [B, HWA, 4]).
    """

    anchors_per_location: int = 3
    anchor_stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b = x.shape[0]
        s = self.anchor_stride
        shared = nn.Conv(
            512, (3, 3), strides=(s, s), padding="SAME", dtype=self.dtype,
            name="conv_shared",
        )(x)
        shared = nn.relu(shared)

        # The class/bbox 1x1 convs have tiny output widths (2A=6 / 4A=12)
        # that each pad to a 128-lane register tile; fusing them into ONE
        # matmul reads the 512-ch shared map once instead of twice. Params
        # keep nn.Conv's tree (ConvParams) so checkpoints load unchanged.
        a = self.anchors_per_location
        kc, bc = ConvParams(1, 1, 512, 2 * a, name="conv_class")()
        kb, bb = ConvParams(1, 1, 512, 4 * a, name="conv_bbox")()
        w_cat = jnp.concatenate([kc[0, 0], kb[0, 0]], axis=-1)   # [512, 6a]
        b_cat = jnp.concatenate([bc, bb])
        out = shared @ w_cat.astype(shared.dtype) + b_cat.astype(shared.dtype)

        # [B, H, W, A*2] -> [B, H*W*A, 2]: anchor-major pairs, matching both
        # the reference reshape (modals.py:396-398) and anchor generation order.
        logits = out[..., : 2 * a].reshape(b, -1, 2)
        probs = nn.softmax(logits.astype(jnp.float32), axis=-1)
        deltas = out[..., 2 * a:].reshape(b, -1, 4)
        return logits, probs, deltas


class ClassifierHead(nn.Module):
    """Box classifier + regressor over pooled ROI features.

    Input: [N, pool, pool, C] pooled crops. Output:
    (class_logits [N, num_classes], probs, deltas [N, num_classes, 4]).
    """

    num_classes: int
    pool_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        n = x.shape[0]
        x = x.astype(self.dtype)
        # k = pool_size VALID on a pool_size input == one matmul (the conv
        # lowering measured ~10 TFLOP/s here; the matmul form hits the MXU)
        y = FullKernelConv(
            1024, (self.pool_size, self.pool_size), dtype=self.dtype,
            name="conv1",
        )(x)
        y = FrozenBatchNorm(name="frozen_bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(1024, (1, 1), padding="VALID", dtype=self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(name="frozen_bn2")(y)
        y = nn.relu(y)
        y = y.reshape(n, 1024)

        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="linear_class")(y)
        logits = logits.astype(jnp.float32)
        probs = nn.softmax(logits, axis=-1)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="linear_bbox")(y)
        deltas = deltas.reshape(n, self.num_classes, 4).astype(jnp.float32)
        return logits, probs, deltas


class RefineHead(nn.Module):
    """Optional mask-refinement head (the reference's dormant ``Refine``
    module, modals.py:501-535, and the ``amodal_refine`` seam it feeds,
    model.py:698-703). Disabled by default (``Config.use_refine_head``);
    same conv stack as the mask head over a small fused-feature input."""

    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for i in range(1, 5):
            x = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = FrozenBatchNorm(name=f"frozen_bn{i}")(x)
            x = nn.relu(x)
        x = DepthToSpaceDeconv(256, dtype=self.dtype, name="deconv")(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_classes, (1, 1), padding="VALID", dtype=self.dtype,
                    name="conv5")(x)
        return x.astype(jnp.float32)


class MaskHead(nn.Module):
    """Layer-mask head: [GLM prior ‖ FPN crop] → num_classes logit maps.

    Input: fpn_crop [N, p, p, 256], glm_crop [N, p, p, 183].
    Output: (logits [N, 2p, 2p, num_classes], features [N, p, p, 256]).
    """

    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fpn_crop: jnp.ndarray, glm_crop: jnp.ndarray):
        x = jnp.concatenate(
            [glm_crop.astype(self.dtype), fpn_crop.astype(self.dtype)], axis=-1
        )
        for i in range(1, 5):
            x = nn.Conv(
                256, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = FrozenBatchNorm(name=f"frozen_bn{i}")(x)
            x = nn.relu(x)
        feat = x
        x = DepthToSpaceDeconv(256, dtype=self.dtype, name="deconv")(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.num_classes, (1, 1), padding="VALID", dtype=self.dtype, name="conv5"
        )(x)
        return x.astype(jnp.float32), feat
