"""Crop-and-resize (RoIAlign) as gather-based XLA, TPU-native.

Reproduces the TF-legacy semantics of the reference CUDA kernel
(``/root/reference/roialign/roi_align/src/cuda/crop_and_resize_kernel.cu:11-82``):
normalized (y1, x1, y2, x2) boxes, sample coordinates scaled by ``(dim - 1)``,
bilinear interpolation, ``extrapolation_value`` outside the image.

Unlike the reference's atomicAdd backward (non-deterministic on GPU), the
backward here is JAX autodiff through gathers — a deterministic scatter-add.

Two entry points:

- :func:`crop_and_resize` — single feature map (the reference's
  ``pyramid_roi_align_image`` / detection-target mask cropping).
- :func:`pyramid_roi_align` — FPN multi-level pooling with the
  FPN-paper level assignment (``/root/reference/modal/modals.py:20-110``).
  Levels are flattened into one [sum(Hl*Wl), C] buffer and sampled with a
  single 4-corner gather — no per-level dynamic grouping, fully static.
- :func:`pyramid_roi_align_batched` — the batch-native form: the batch is
  folded into the flat gather table ([B*sum(Hl*Wl), C]) and every image's
  boxes share ONE gather program, instead of lifting the per-image op with
  ``jax.vmap`` (measured ~2x per-image cost at batch 8 — the same pattern
  the proposal path's batched NMS removed). The b=1 slice is bit-identical
  to the per-image op.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _sample_coords(lo, hi, out_size: int, dim_size):
    """TF crop_and_resize sample coordinates along one axis.

    lo/hi: [N] normalized edge coords; dim_size: scalar or [N] pixel extent.
    Returns [N, out_size] float coords in pixel space.
    """
    dim1 = dim_size - 1.0
    if out_size > 1:
        scale = (hi - lo) * dim1 / (out_size - 1)
        steps = jnp.arange(out_size, dtype=jnp.float32)
        return lo[:, None] * (jnp.ones_like(lo) * dim1)[:, None] + steps[None, :] * scale[:, None]
    return (0.5 * (lo + hi) * dim1)[:, None]


def crop_and_resize(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    box_indices: jnp.ndarray,
    crop_size: Tuple[int, int],
    extrapolation_value: float = 0.0,
) -> jnp.ndarray:
    """Bilinear crop-and-resize from a single feature map.

    Args:
        image: [B, H, W, C] (NHWC — TPU-native layout).
        boxes: [N, 4] normalized (y1, x1, y2, x2).
        box_indices: [N] int, which batch image each box samples.
        crop_size: (crop_h, crop_w), static.

    Returns: [N, crop_h, crop_w, C].
    """
    b, h, w, c = image.shape
    ch, cw = crop_size
    boxes = boxes.astype(jnp.float32)
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]

    in_y = _sample_coords(y1, y2, ch, float(h))  # [N, ch]
    in_x = _sample_coords(x1, x2, cw, float(w))  # [N, cw]

    valid_y = (in_y >= 0) & (in_y <= h - 1)
    valid_x = (in_x >= 0) & (in_x <= w - 1)

    top = jnp.floor(in_y)
    bottom = jnp.ceil(in_y)
    y_lerp = (in_y - top).astype(image.dtype)
    left = jnp.floor(in_x)
    right = jnp.ceil(in_x)
    x_lerp = (in_x - left).astype(image.dtype)

    top = jnp.clip(top, 0, h - 1).astype(jnp.int32)
    bottom = jnp.clip(bottom, 0, h - 1).astype(jnp.int32)
    left = jnp.clip(left, 0, w - 1).astype(jnp.int32)
    right = jnp.clip(right, 0, w - 1).astype(jnp.int32)

    bi = box_indices.astype(jnp.int32)[:, None, None]

    def gather(yy, xx):
        # [N, ch, cw, C]
        return image[bi, yy[:, :, None], xx[:, None, :], :]

    tl = gather(top, left)
    tr = gather(top, right)
    bl = gather(bottom, left)
    br = gather(bottom, right)

    top_v = tl + (tr - tl) * x_lerp[:, None, :, None]
    bot_v = bl + (br - bl) * x_lerp[:, None, :, None]
    out = top_v + (bot_v - top_v) * y_lerp[:, :, None, None]

    valid = valid_y[:, :, None, None] & valid_x[:, None, :, None]
    return jnp.where(valid, out, jnp.asarray(extrapolation_value, image.dtype))


def crop_and_resize_blocked(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    box_indices: jnp.ndarray,
    crop_size: Tuple[int, int],
    extrapolation_value: float = 0.0,
) -> jnp.ndarray:
    """:func:`crop_and_resize` with the footprint-blocked gather: one
    (1,2,2,C)-slice gather per sample instead of four row gathers —
    bit-identical outputs, ~4x fewer gather indices (see the blocked-gather
    note below).

    Falls back to the row-gather form for narrow channel counts: XLA lowers
    the (1,2,2,C)-slice gather on large tables to a SERIAL while loop when C
    is tiny (measured: C=1 GT-mask crops at [50,1024,1024,1] ran 102,400
    dynamic-slice iterations = 228 ms inside the train step, vs <1 ms as a
    row gather), while C>=184 production uses are faster blocked."""
    b, h, w, c = image.shape
    if h < 2 or w < 2 or c < _BLOCKED_MIN_CHANNELS:
        return crop_and_resize(
            image, boxes, box_indices, crop_size, extrapolation_value)
    ch, cw = crop_size
    n = boxes.shape[0]
    boxes = boxes.astype(jnp.float32)
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]

    in_y = _sample_coords(y1, y2, ch, float(h))  # [N, ch]
    in_x = _sample_coords(x1, x2, cw, float(w))  # [N, cw]
    valid_y = (in_y >= 0) & (in_y <= h - 1)
    valid_x = (in_x >= 0) & (in_x <= w - 1)

    top = jnp.clip(jnp.floor(in_y), 0, h - 1).astype(jnp.int32)
    bottom = jnp.clip(jnp.ceil(in_y), 0, h - 1).astype(jnp.int32)
    y_lerp = (in_y - jnp.floor(in_y)).astype(image.dtype)
    left = jnp.clip(jnp.floor(in_x), 0, w - 1).astype(jnp.int32)
    right = jnp.clip(jnp.ceil(in_x), 0, w - 1).astype(jnp.int32)
    x_lerp = (in_x - jnp.floor(in_x)).astype(image.dtype)

    y0 = jnp.minimum(top, h - 2)   # [N, ch] block starts
    x0 = jnp.minimum(left, w - 2)  # [N, cw]

    bi = box_indices.astype(jnp.int32)
    shape = (n, ch, cw)
    starts = jnp.stack(
        [
            jnp.broadcast_to(bi[:, None, None], shape),
            jnp.broadcast_to(y0[:, :, None], shape),
            jnp.broadcast_to(x0[:, None, :], shape),
        ],
        axis=-1,
    ).reshape(-1, 3)
    blocks = _gather_blocks(image, starts, c).reshape(n, ch * cw, 2, 2, c)

    def grid_y(a):
        return jnp.broadcast_to(a[:, :, None], shape).reshape(n, -1)

    def grid_x(a):
        return jnp.broadcast_to(a[:, None, :], shape).reshape(n, -1)

    valid = valid_y[:, :, None] & valid_x[:, None, :]
    out = _bilinear_from_blocks(
        blocks, grid_y(top), grid_y(bottom), grid_x(left), grid_x(right),
        grid_y(y0), grid_x(x0), grid_y(y_lerp), grid_x(x_lerp),
        valid.reshape(n, -1), extrapolation_value)
    return out.reshape(n, ch, cw, c)


def roi_levels(
    boxes: jnp.ndarray, image_area: float, min_level: int = 2, max_level: int = 5
) -> jnp.ndarray:
    """FPN-paper level assignment (modals.py:62-64).

    boxes are normalized; level = round(4 + log2(sqrt(hw)/(224/sqrt(area)))),
    clamped to [min_level, max_level]. round() is half-to-even, like torch.
    """
    h = boxes[:, 2] - boxes[:, 0]
    w = boxes[:, 3] - boxes[:, 1]
    size = jnp.sqrt(jnp.maximum(h * w, 1e-12))
    lvl = 4.0 + jnp.log2(size / (224.0 / jnp.sqrt(image_area)))
    return jnp.clip(jnp.round(lvl), min_level, max_level).astype(jnp.int32)


def _sample_geometry(shapes, boxes, crop_size, image_shape):
    ch, cw = crop_size
    heights = np.array([s[0] for s in shapes], np.float32)
    widths = np.array([s[1] for s in shapes], np.float32)

    lvl = roi_levels(boxes, float(image_shape[0] * image_shape[1]))
    lvl_idx = jnp.clip(lvl - 2, 0, len(shapes) - 1)
    h_l = jnp.asarray(heights)[lvl_idx]
    w_l = jnp.asarray(widths)[lvl_idx]

    boxes = boxes.astype(jnp.float32)
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]

    def coords(lo, hi, out_size, dim):
        dim1 = dim - 1.0
        if out_size > 1:
            scale = (hi - lo) * dim1 / (out_size - 1)
            steps = jnp.arange(out_size, dtype=jnp.float32)
            return lo[:, None] * dim1[:, None] + steps[None, :] * scale[:, None]
        return (0.5 * (lo + hi) * dim1)[:, None]

    in_y = coords(y1, y2, ch, h_l)
    in_x = coords(x1, x2, cw, w_l)
    valid_y = (in_y >= 0) & (in_y <= (h_l[:, None] - 1))
    valid_x = (in_x >= 0) & (in_x <= (w_l[:, None] - 1))
    top = jnp.clip(jnp.floor(in_y), 0, h_l[:, None] - 1)
    bottom = jnp.clip(jnp.ceil(in_y), 0, h_l[:, None] - 1)
    y_lerp = in_y - jnp.floor(in_y)
    left = jnp.clip(jnp.floor(in_x), 0, w_l[:, None] - 1)
    right = jnp.clip(jnp.ceil(in_x), 0, w_l[:, None] - 1)
    x_lerp = in_x - jnp.floor(in_x)
    return (lvl_idx, valid_y, valid_x, top, bottom, y_lerp, left, right, x_lerp)


def pyramid_roi_align_gather(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    crop_size: Tuple[int, int],
    image_shape: Tuple[int, int],
    extrapolation_value: float = 0.0,
) -> jnp.ndarray:
    """Multi-level RoIAlign over FPN features P2..P5 (per-image).

    Args:
        features: sequence of [Hl, Wl, C] maps ordered P2, P3, P4, P5.
        boxes: [N, 4] normalized (y1, x1, y2, x2).
        crop_size: (h, w) of pooled output, static.
        image_shape: (H, W) of the input image in pixels (for the level rule).

    Returns: [N, crop_h, crop_w, C].

    All levels are flattened into one [S, C] buffer; each box computes flat
    gather indices for its assigned level — one gather program for all boxes,
    no boolean grouping (replaces the dynamic per-level loop of
    modals.py:67-110 with a static gather, the XLA-idiomatic formulation).
    The sampling geometry is shared with the custom-VJP backward
    (:func:`_sample_geometry`) so the two stay bit-identical.
    """
    shapes = tuple(f.shape for f in features)
    c = shapes[0][-1]
    widths = np.array([sh[1] for sh in shapes], np.float32)
    sizes = [int(sh[0] * sh[1]) for sh in shapes]
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)

    flat = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)

    (lvl_idx, valid_y, valid_x, top, bottom, y_lerp, left, right,
     x_lerp) = _sample_geometry(shapes, boxes, crop_size, image_shape)

    wl_i = jnp.asarray(widths)[lvl_idx].astype(jnp.int32)[:, None, None]
    off_i = jnp.asarray(offsets)[lvl_idx].astype(jnp.int32)[:, None, None]
    y_lerp = y_lerp.astype(flat.dtype)
    x_lerp = x_lerp.astype(flat.dtype)

    def flat_idx(yy, xx):
        return off_i + yy.astype(jnp.int32)[:, :, None] * wl_i + xx.astype(jnp.int32)[:, None, :]

    tl = flat[flat_idx(top, left)]
    tr = flat[flat_idx(top, right)]
    bl = flat[flat_idx(bottom, left)]
    br = flat[flat_idx(bottom, right)]

    top_v = tl + (tr - tl) * x_lerp[:, None, :, None]
    bot_v = bl + (br - bl) * x_lerp[:, None, :, None]
    out = top_v + (bot_v - top_v) * y_lerp[:, :, None, None]

    valid = valid_y[:, :, None, None] & valid_x[:, None, :, None]
    return jnp.where(valid, out, jnp.asarray(extrapolation_value, flat.dtype))


# ---------------------------------------------------------- blocked gather ---
#
# Minimum channel width for the footprint-blocked gather to beat the row
# gather. Below this, XLA can lower the multi-dim (1,2,2,C) slice to a serial
# while loop (one dynamic-slice per index) on large tables — catastrophically
# slow — whereas the plain point gather always vectorizes. Production blocked
# uses are C=184 (GLM prior) and C=256 (FPN); the C=1/C=3 crop sites (GT mask
# targets, refine-head seams) take the row-gather path.
_BLOCKED_MIN_CHANNELS = 32

# XLA's TPU gather costs ~10 ns PER INDEX here regardless of the gathered
# row's width (measured: 1.57M 512-B rows -> 15.3 ms, 819k 366-B rows ->
# 8.5 ms; scripts/profile_roihead.py) — index-overhead-bound, not
# bandwidth-bound. A bilinear sample reads a 2x2 pixel footprint, so
# fetching the whole footprint with ONE gather (slice_sizes=(1,2,2,C))
# quarters the index count. The 2x2 slice start is clamped to (dim-2) and
# the four corners are re-selected from the block arithmetically, which
# reproduces the 4-gather corner VALUES bit-exactly (incl. integral
# coordinates and boxes touching the far edge, where top==bottom==dim-1
# lands in the block's second row).


def _gather_blocks(table, starts, c):
    """ONE gather of [N, 2, 2, C] blocks from table [B, H, W, C] at
    starts [N, 3] = (batch, row0, col0)."""
    return jax.lax.gather(
        table,
        starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2),
        ),
        slice_sizes=(1, 2, 2, c),
    )


def _bilinear_from_blocks(blocks, top, bottom, left, right, y0, x0,
                          y_lerp, x_lerp, valid, extrapolation_value):
    """Shared corner-select + lerp for the blocked gather paths.

    blocks [N, S, 2, 2, C] where S = ch*cw samples; index arrays [N, S].
    Returns [N, S, C]."""
    n, s = top.shape
    c = blocks.shape[-1]
    flat = blocks.reshape(n * s, 2, 2, c)
    ty = (top - y0).reshape(-1, 1, 1)   # {0, 1}: which block row is 'top'
    by = (bottom - y0).reshape(-1, 1, 1)
    lx = (left - x0).reshape(-1, 1)
    rx = (right - x0).reshape(-1, 1)
    row_t = jnp.where(ty == 1, flat[:, 1], flat[:, 0])   # [NS, 2, C]
    row_b = jnp.where(by == 1, flat[:, 1], flat[:, 0])
    tl = jnp.where(lx == 1, row_t[:, 1], row_t[:, 0])    # [NS, C]
    tr = jnp.where(rx == 1, row_t[:, 1], row_t[:, 0])
    bl = jnp.where(lx == 1, row_b[:, 1], row_b[:, 0])
    br = jnp.where(rx == 1, row_b[:, 1], row_b[:, 0])

    xl = x_lerp.reshape(-1, 1).astype(flat.dtype)
    yl = y_lerp.reshape(-1, 1).astype(flat.dtype)
    top_v = tl + (tr - tl) * xl
    bot_v = bl + (br - bl) * xl
    out = top_v + (bot_v - top_v) * yl
    out = jnp.where(valid.reshape(-1, 1), out,
                    jnp.asarray(extrapolation_value, flat.dtype))
    return out.reshape(n, s, c)


# -------------------------------------------------------- custom backward ---
#
# XLA lowers the gather's reverse-mode transpose to a scatter-add, which is
# catastrophically slow on TPU for duplicate indices (it serializes). The
# bilinear crop is separable — out[n,i,j,c] = Σ_y Σ_x Yw[n,i,y]·Xw[n,j,x]·
# F[y,x,c] with 2-nonzero one-hot weight rows — so the feature gradient is
# two einsums per pyramid level, all MXU work:
#
#     A[n,i,x,c]  = Σ_j Xw[n,j,x] · g[n,i,j,c]
#     dF_l[y,x,c] = Σ_{n,i} Yw[n,i,y] · A[n,i,x,c]     (n restricted to level l)
#
# Box gradients are defined zero: every caller treats ROI boxes as sampling
# locations, not a gradient path (the reference detaches them, modals.py:81).


def _axis_weights(lo_idx, hi_idx, lerp, valid, mask_n, dim):
    """[N, K, dim] one-hot interpolation weights along one axis."""
    iota = jnp.arange(dim, dtype=jnp.float32)[None, None, :]
    w = (lo_idx[:, :, None] == iota) * (1.0 - lerp[:, :, None]) + (
        hi_idx[:, :, None] == iota
    ) * lerp[:, :, None]
    return w * valid[:, :, None] * mask_n[:, None, None]


def pyramid_roi_align(features, boxes, crop_size, image_shape):
    """:func:`pyramid_roi_align_gather` with an MXU-friendly backward.

    features: sequence of [Hl, Wl, C]; boxes [N, 4] normalized; returns
    [N, ch, cw, C]. Gradients: einsum into features, zero into boxes.
    """
    features = tuple(features)
    shapes = tuple(f.shape for f in features)
    dtypes = tuple(f.dtype for f in features)

    @jax.custom_vjp
    def op(features, boxes):
        return pyramid_roi_align_gather(features, boxes, crop_size, image_shape)

    def fwd(features, boxes):
        return op(features, boxes), boxes

    def bwd(boxes_res, g):
        geom = _sample_geometry(shapes, boxes_res, crop_size, image_shape)
        (lvl_idx, valid_y, valid_x, top, bottom, y_lerp, left, right, x_lerp) = geom
        g32 = g.astype(jnp.float32)
        grads = []
        for l, shape in enumerate(shapes):
            hl, wl, _ = shape
            mask_n = (lvl_idx == l).astype(jnp.float32)
            yw = _axis_weights(
                top, bottom, y_lerp, valid_y.astype(jnp.float32), mask_n, hl
            )
            xw = _axis_weights(
                left, right, x_lerp, valid_x.astype(jnp.float32), mask_n, wl
            )
            a = jnp.einsum(
                "njx,nijc->nixc", xw, g32, preferred_element_type=jnp.float32
            )
            df = jnp.einsum(
                "niy,nixc->yxc", yw, a, preferred_element_type=jnp.float32
            )
            grads.append(df.astype(dtypes[l]))
        return tuple(grads), jnp.zeros_like(boxes_res)

    op.defvjp(fwd, bwd)
    return op(features, boxes)


# ------------------------------------------------------- dense small-table ---


def crop_and_resize_dense_batched(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    crop_size: Tuple[int, int],
) -> jnp.ndarray:
    """:func:`crop_and_resize` for a SMALL per-image table, as two separable
    interpolation einsums instead of a gather.

    image: [B, H, W, C]; boxes: [B, N, 4] normalized (each image's boxes crop
    its own table — the mask head's GLM-prior pattern, sln.py::_mask_on).
    Returns [B, N, ch, cw, C].

    The bilinear crop is ``out[b,n,i,j,c] = Σ_pq Yw[b,n,i,p]·Xw[b,n,j,q]·
    T[b,p,q,c]`` with 2-nonzero weight rows; for the 65²-cell GLM prior the
    dense contraction is ~5 GFLOP of MXU work at the production shapes vs a
    bandwidth-ceiling-bound gather (~55 GB/s — COMPONENTS.md). Invalid
    (out-of-range) samples get zero weight rows == extrapolation value 0.
    Accumulates in f32 (the gather path lerps in the feature dtype; same
    ~bf16-ULP class of difference as the patch-DMA kernel).
    """
    b, h, w, c = image.shape
    n = boxes.shape[1]
    ch, cw = crop_size
    flat_boxes = boxes.reshape(b * n, 4).astype(jnp.float32)
    y1, x1, y2, x2 = (flat_boxes[:, i] for i in range(4))
    in_y = _sample_coords(y1, y2, ch, float(h))
    in_x = _sample_coords(x1, x2, cw, float(w))
    valid_y = ((in_y >= 0) & (in_y <= h - 1)).astype(jnp.float32)
    valid_x = ((in_x >= 0) & (in_x <= w - 1)).astype(jnp.float32)
    top = jnp.clip(jnp.floor(in_y), 0, h - 1)
    bottom = jnp.clip(jnp.ceil(in_y), 0, h - 1)
    y_lerp = in_y - jnp.floor(in_y)
    left = jnp.clip(jnp.floor(in_x), 0, w - 1)
    right = jnp.clip(jnp.ceil(in_x), 0, w - 1)
    x_lerp = in_x - jnp.floor(in_x)
    ones = jnp.ones((b * n,), jnp.float32)
    yw = _axis_weights(top, bottom, y_lerp, valid_y, ones, h)
    xw = _axis_weights(left, right, x_lerp, valid_x, ones, w)
    yw = yw.reshape(b, n, ch, h).astype(image.dtype)
    xw = xw.reshape(b, n, cw, w).astype(image.dtype)
    t1 = jnp.einsum("bnip,bpqc->bniqc", yw, image,
                    preferred_element_type=jnp.float32).astype(image.dtype)
    out = jnp.einsum("bnjq,bniqc->bnijc", xw, t1,
                     preferred_element_type=jnp.float32)
    return out.astype(image.dtype)


# ------------------------------------------------------------ batch-native ---


def pyramid_roi_align_gather_batched(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    crop_size: Tuple[int, int],
    image_shape: Tuple[int, int],
    extrapolation_value: float = 0.0,
) -> jnp.ndarray:
    """Multi-level RoIAlign over a BATCH of FPN pyramids in one gather.

    Args:
        features: sequence of [B, Hl, Wl, C] maps ordered P2, P3, P4, P5.
        boxes: [B, N, 4] normalized (y1, x1, y2, x2).

    Returns: [B, N, crop_h, crop_w, C].

    Identical per-box math to :func:`pyramid_roi_align_gather`; the batch
    dimension becomes an index offset (image b's pyramid occupies rows
    [b*S, (b+1)*S) of the flat table), so XLA sees one large static gather
    instead of a vmap-lifted per-image program.
    """
    b, n = boxes.shape[:2]
    shapes = tuple(f.shape[1:] for f in features)
    c = shapes[0][-1]
    widths = np.array([sh[1] for sh in shapes], np.float32)
    sizes = [int(sh[0] * sh[1]) for sh in shapes]
    total = int(np.sum(sizes))
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)

    flat = jnp.concatenate(
        [f.reshape(b, -1, c) for f in features], axis=1
    ).reshape(b * total, c)

    flat_boxes = boxes.reshape(b * n, 4)
    (lvl_idx, valid_y, valid_x, top, bottom, y_lerp, left, right,
     x_lerp) = _sample_geometry(shapes, flat_boxes, crop_size, image_shape)

    wl_i = jnp.asarray(widths)[lvl_idx].astype(jnp.int32)[:, None, None]
    img_off = jnp.repeat(jnp.arange(b, dtype=jnp.int32) * total, n)
    off_i = (jnp.asarray(offsets)[lvl_idx] + img_off)[:, None, None]
    y_lerp = y_lerp.astype(flat.dtype)
    x_lerp = x_lerp.astype(flat.dtype)

    def flat_idx(yy, xx):
        return off_i + yy.astype(jnp.int32)[:, :, None] * wl_i + xx.astype(jnp.int32)[:, None, :]

    tl = flat[flat_idx(top, left)]
    tr = flat[flat_idx(top, right)]
    bl = flat[flat_idx(bottom, left)]
    br = flat[flat_idx(bottom, right)]

    top_v = tl + (tr - tl) * x_lerp[:, None, :, None]
    bot_v = bl + (br - bl) * x_lerp[:, None, :, None]
    out = top_v + (bot_v - top_v) * y_lerp[:, :, None, None]

    valid = valid_y[:, :, None, None] & valid_x[:, None, :, None]
    out = jnp.where(valid, out, jnp.asarray(extrapolation_value, flat.dtype))
    return out.reshape(b, n, *out.shape[1:])


def pyramid_roi_align_gather_batched_blocked(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    crop_size: Tuple[int, int],
    image_shape: Tuple[int, int],
    extrapolation_value: float = 0.0,
) -> jnp.ndarray:
    """:func:`pyramid_roi_align_gather_batched` with the footprint-blocked
    gather: the levels are stacked along HEIGHT with their widths padded to
    the widest level ([B, sum(Hl), Wmax, C] — ~1.4x the flat table's bytes,
    ~0.7 ms to build at b8 and shared by XLA across the classifier and mask
    stages), and every bilinear sample fetches its whole 2x2 footprint with
    ONE (1,2,2,C)-slice gather. Block starts clamp to (dim-2) per level, so
    a slice never crosses into a neighbouring level or the width padding.
    Outputs are bit-identical to the row-gather form; gather index count
    drops 4x (the measured cost is ~10 ns/index regardless of slice bytes —
    scripts/profile_roihead.py).

    Falls back to the row-gather form when any level dim is < 2 (the y0/x0
    clamp to dim-2 would go negative and the 2x2 slice would cross into a
    neighbouring level or the width padding) or when the channel count is
    below :data:`_BLOCKED_MIN_CHANNELS` (serial-loop lowering — see
    :func:`crop_and_resize_blocked`)."""
    b, n = boxes.shape[:2]
    shapes = tuple(f.shape[1:] for f in features)
    c = shapes[0][-1]
    if any(sh[0] < 2 or sh[1] < 2 for sh in shapes) or c < _BLOCKED_MIN_CHANNELS:
        return pyramid_roi_align_gather_batched(
            features, boxes, crop_size, image_shape, extrapolation_value)
    heights = np.array([sh[0] for sh in shapes], np.int32)
    widths = np.array([sh[1] for sh in shapes], np.int32)
    wmax = int(widths.max())
    row_offsets = np.concatenate([[0], np.cumsum(heights)[:-1]]).astype(np.int32)

    table = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, 0), (0, wmax - f.shape[2]), (0, 0)))
         for f in features],
        axis=1,
    )  # [B, sum(Hl), Wmax, C]

    ch, cw = crop_size
    flat_boxes = boxes.reshape(b * n, 4)
    (lvl_idx, valid_y, valid_x, top, bottom, y_lerp, left, right,
     x_lerp) = _sample_geometry(shapes, flat_boxes, crop_size, image_shape)
    top = top.astype(jnp.int32)
    bottom = bottom.astype(jnp.int32)
    left = left.astype(jnp.int32)
    right = right.astype(jnp.int32)

    h_l = jnp.asarray(heights)[lvl_idx]                       # [BN]
    w_l = jnp.asarray(widths)[lvl_idx]
    off_l = jnp.asarray(row_offsets)[lvl_idx]
    y0 = jnp.minimum(top, (h_l - 2)[:, None])                 # [BN, ch]
    x0 = jnp.minimum(left, (w_l - 2)[:, None])                # [BN, cw]
    row0 = y0 + off_l[:, None]
    bi = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)        # [BN]

    bn = b * n
    shape = (bn, ch, cw)
    starts = jnp.stack(
        [
            jnp.broadcast_to(bi[:, None, None], shape),
            jnp.broadcast_to(row0[:, :, None], shape),
            jnp.broadcast_to(x0[:, None, :], shape),
        ],
        axis=-1,
    ).reshape(-1, 3)
    blocks = _gather_blocks(table, starts, c).reshape(bn, ch * cw, 2, 2, c)

    def grid_y(a):
        return jnp.broadcast_to(a[:, :, None], shape).reshape(bn, -1)

    def grid_x(a):
        return jnp.broadcast_to(a[:, None, :], shape).reshape(bn, -1)

    valid = valid_y[:, :, None] & valid_x[:, None, :]
    out = _bilinear_from_blocks(
        blocks, grid_y(top), grid_y(bottom), grid_x(left), grid_x(right),
        grid_y(y0), grid_x(x0), grid_y(y_lerp), grid_x(x_lerp),
        valid.reshape(bn, -1), extrapolation_value)
    return out.reshape(b, n, ch, cw, c)


def pyramid_roi_align_batched(features, boxes, crop_size, image_shape,
                              impl: str = "blocked"):
    """:func:`pyramid_roi_align_gather_batched` with the MXU einsum backward.

    features: sequence of [B, Hl, Wl, C]; boxes [B, N, 4] normalized; returns
    [B, N, ch, cw, C]. Gradients: einsum into features, zero into boxes —
    the batched generalization of :func:`pyramid_roi_align`'s backward (the
    level masks and one-hot axis weights gain a leading batch dim and the
    second einsum keeps it: ``bniy,bnixc->byxc``).

    ``impl`` picks the forward: 'blocked' = footprint-blocked gather
    (bit-identical to the row-gather oracle), 'patch' = the Pallas
    patch-DMA kernel (ops/roi_patch_pallas.py — f32-accumulated, ~1e-6 of
    the gather path in f32), 'auto' = patch on TPU, blocked elsewhere.
    """
    features = tuple(features)
    shapes = tuple(f.shape[1:] for f in features)
    dtypes = tuple(f.dtype for f in features)
    b, n = boxes.shape[:2]
    if impl == "auto":
        impl = "patch" if jax.default_backend() in ("tpu", "axon") else "blocked"

    @jax.custom_vjp
    def op(features, boxes):
        if impl == "patch":
            from .roi_patch_pallas import pyramid_roi_align_patch
            return pyramid_roi_align_patch(
                features, boxes, crop_size, image_shape)
        # footprint-blocked gather: bit-identical to the row-gather form,
        # fewer gather indices (the faster of the two on v5e — see the
        # blocked-gather note above; the row-gather form stays as the
        # equivalence oracle in tests/test_roi_align_blocked.py)
        return pyramid_roi_align_gather_batched_blocked(
            features, boxes, crop_size, image_shape)

    def fwd(features, boxes):
        return op(features, boxes), boxes

    def bwd(boxes_res, g):
        geom = _sample_geometry(
            shapes, boxes_res.reshape(b * n, 4), crop_size, image_shape)
        (lvl_idx, valid_y, valid_x, top, bottom, y_lerp, left, right,
         x_lerp) = geom
        g32 = g.astype(jnp.float32)
        grads = []
        for l, shape in enumerate(shapes):
            hl, wl, _ = shape
            mask_n = (lvl_idx == l).astype(jnp.float32)
            yw = _axis_weights(
                top, bottom, y_lerp, valid_y.astype(jnp.float32), mask_n, hl
            ).reshape(b, n, -1, hl)
            xw = _axis_weights(
                left, right, x_lerp, valid_x.astype(jnp.float32), mask_n, wl
            ).reshape(b, n, -1, wl)
            a = jnp.einsum(
                "bnjx,bnijc->bnixc", xw, g32, preferred_element_type=jnp.float32
            )
            df = jnp.einsum(
                "bniy,bnixc->byxc", yw, a, preferred_element_type=jnp.float32
            )
            grads.append(df.astype(dtypes[l]))
        return tuple(grads), jnp.zeros_like(boxes_res)

    op.defvjp(fwd, bwd)
    return op(features, boxes)
