"""RoIAlign as a Pallas patch-DMA kernel.

The production RoIAlign gathers run at ~55 GB/s on v5e regardless of slice
size or index count (measured across every XLA gather variant —
COMPONENTS.md "the gather ceiling"), because XLA's gather issues one small
descriptor per sample footprint (2 KB at C=256). This kernel instead DMAs
each ROI's whole sampling footprint as ONE [PATCH, PATCH_X, C] strided copy
(32 rows x 20 KB contiguous at C=256) from the height-concatenated level
table — the DMA engines stream large strided slices at a large multiple of
the gather rate — and evaluates the bilinear pool as two small MXU matmuls
per ROI (the interpolation is separable: ``out[i,j,c] = sum_ab
Wy[i,a] Wx[j,b] patch[a,b,c]`` where each weight row has <= 2 nonzeros).

Semantics match :func:`sln_amodal_tpu.ops.roi_align.pyramid_roi_align_gather_batched`
(TF-legacy crop_and_resize per the reference CUDA kernel
``/root/reference/roialign/roi_align/src/cuda/crop_and_resize_kernel.cu:11-82``,
FPN-paper level rule ``/root/reference/modal/modals.py:62-64``) up to
floating-point association: the matmul accumulates the 4 corners in f32,
where the gather path lerps in the feature dtype. In f32 the results agree
to ~1e-6; in bf16 the kernel is (slightly) the more accurate of the two.

ROIs whose sampling span exceeds PATCH-1 cells on either axis (aspect
ratio ≳ 2.4 at the top of an FPN level's size band — the level rule bounds
sqrt(hw) to < 20 cells, so only elongated boxes overflow) are routed to the
row-gather path: their rows are compacted into a fixed ``spill_slots``-wide
side table, cropped by one small gather program, and scattered back. If
more than ``spill_slots`` ROIs overflow (never observed at the production
shapes; requires hundreds of extreme-aspect detections at once), a
``lax.cond`` switches the whole call to the blocked-gather path — exactness
is unconditional.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import (
    _sample_geometry,
    pyramid_roi_align_gather_batched,
    pyramid_roi_align_gather_batched_blocked,
)

PATCH = 32    # footprint patch rows (cells); the row dim is untiled
# Patch columns: cols are the SUBLANE dim of the [B, H, W, C] table's tiled
# layout, so a DMA's dynamic column offset must be 8-aligned (Mosaic:
# "tile index in dimension 2 divisible by the tiling (8)"). x0 aligns down
# to a multiple of 8 (up to 7 cells of slack), so the column extent is
# PATCH + 8 = 40 to still cover a 32-cell span.
PATCH_X = PATCH + 8


def _patch_kernel(bi_ref, row_ref, col_ref, wy_ref, wx_ref, table_ref,
                  out_ref, patch, sem, *, group: int):
    """One grid step pools ``group`` ROIs; patches for step i+1 stream in
    while step i computes (double-buffered DMA). The patch origins arrive
    as three 1-D scalar-prefetch arrays (a 2-D [N, 3] array would be
    lane-padded to [N, 128] in SMEM — 4 MB at N=8000, over the 1 MB SMEM)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(step, g, slot):
        j = step * group + g
        return pltpu.make_async_copy(
            table_ref.at[
                bi_ref[j],
                pl.ds(row_ref[j], PATCH),
                # col carries x0/8; the explicit *8 lets Mosaic PROVE the
                # sublane-tiled column offset is 8-aligned (a pre-aligned
                # runtime value is opaque to its divisibility analysis)
                pl.ds(col_ref[j] * 8, PATCH_X),
                :,
            ],
            patch.at[slot, g],
            sem.at[slot, g],
        )

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        for g in range(group):
            dma(i, g, slot).start()

    @pl.when(i + 1 < n)
    def _():
        for g in range(group):
            dma(i + 1, g, 1 - slot).start()

    for g in range(group):
        dma(i, g, slot).wait()

    c = table_ref.shape[-1]
    pool = wy_ref.shape[2]
    f32 = jnp.float32
    for g in range(group):
        p = patch[slot, g]                                   # [P, P, C]
        # t1[i, b, c] = sum_a wy[i, a] * p[a, b, c]
        t1 = jax.lax.dot_general(
            wy_ref[0, g], p.reshape(PATCH, PATCH_X * c),
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        ).reshape(pool, PATCH_X, c).astype(p.dtype)
        # out[j, i, c] = sum_b wx[j, b] * t1[i, b, c] — stored TRANSPOSED
        # ([pool_x, pool_y, C]); the caller swaps the pool axes in XLA,
        # where the relayout fuses into the consumer (an in-kernel
        # transpose measured tens of us per step on v5e)
        o = jax.lax.dot_general(
            wx_ref[0, g], t1,
            (((1,), (1,)), ((), ())), preferred_element_type=f32,
        )                                                    # [pool, pool, C]
        out_ref[0, g] = o.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("pool", "group", "interpret"))
def roi_pool_patches(table, starts, wy, wx, *, pool: int, group: int = 4,
                     interpret: bool = False):
    """Pool N ROIs from ``table`` [B, H, W, C] via patch DMAs.

    starts: [N, 3] int32 (image, row0, col0/8) patch origins, pre-clamped
        so [row0, row0+PATCH) x [col0, col0+PATCH_X) is in-bounds.
    wy, wx: [N, pool, PATCH(_X)] interpolation weights in the table's dtype
        (rows of invalid samples must be all-zero).

    Returns [N, pool, pool, C]. N must be a multiple of ``group``.
    """
    n = starts.shape[0]
    c = table.shape[-1]
    assert n % group == 0, (n, group)
    grid = n // group
    kernel = functools.partial(_patch_kernel, group=group)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, group, pool, PATCH),
                             lambda i, *s: (i, 0, 0, 0)),
                pl.BlockSpec((1, group, pool, PATCH_X),
                             lambda i, *s: (i, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, group, pool, pool, c), lambda i, *s: (i, 0, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, group, PATCH, PATCH_X, c), table.dtype),
                pltpu.SemaphoreType.DMA((2, group)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((grid, group, pool, pool, c),
                                       table.dtype),
        interpret=interpret,
    )(
        starts[:, 0],
        starts[:, 1],
        starts[:, 2],
        wy.reshape(grid, group, pool, PATCH),
        wx.reshape(grid, group, pool, PATCH_X),
        table,
    ).reshape(n, pool, pool, c).swapaxes(1, 2)


def _axis_patch_weights(lo, hi, lerp, origin, valid, dtype, width=PATCH):
    """[N, K, width] bilinear weights relative to the patch origin.

    lo/hi: [N, K] clamped corner indices (level-local); lerp [N, K];
    origin [N] patch start (level-local); valid [N, K]. Weight rows of
    invalid samples are zero (== extrapolation value 0 after the matmul).
    """
    iota = jnp.arange(width, dtype=jnp.int32)[None, None, :]
    lo_rel = (lo.astype(jnp.int32) - origin[:, None])[:, :, None]
    hi_rel = (hi.astype(jnp.int32) - origin[:, None])[:, :, None]
    lerp = lerp[:, :, None].astype(jnp.float32)
    w = (iota == lo_rel) * (1.0 - lerp) + (iota == hi_rel) * lerp
    return (w * valid[:, :, None]).astype(dtype)


def _crop_listed(flat, off_i, wl_i, geom, sel, pool, dtype):
    """Row-gather crop of the ``sel``-indexed subset of the geometry —
    the spill path for ROIs whose footprint exceeds the patch size.

    flat: [B*S, C] row-flat batched level table (as in
    pyramid_roi_align_gather_batched); off_i/wl_i: [BN] flat offsets and
    level widths; geom: the _sample_geometry tuple over all BN boxes;
    sel: [K] indices into BN. Returns [K, pool, pool, C].
    """
    (_, valid_y, valid_x, top, bottom, y_lerp, left, right, x_lerp) = geom
    take = lambda a: a[sel]  # noqa: E731
    top, bottom, left, right = map(take, (top, bottom, left, right))
    y_lerp = take(y_lerp).astype(dtype)
    x_lerp = take(x_lerp).astype(dtype)
    off_k = off_i[sel][:, None, None]
    wl_k = wl_i[sel][:, None, None]

    def flat_idx(yy, xx):
        return (off_k + yy.astype(jnp.int32)[:, :, None] * wl_k
                + xx.astype(jnp.int32)[:, None, :])

    tl = flat[flat_idx(top, left)]
    tr = flat[flat_idx(top, right)]
    bl = flat[flat_idx(bottom, left)]
    br = flat[flat_idx(bottom, right)]
    top_v = tl + (tr - tl) * x_lerp[:, None, :, None]
    bot_v = bl + (br - bl) * x_lerp[:, None, :, None]
    out = top_v + (bot_v - top_v) * y_lerp[:, :, None, None]
    valid = take(valid_y)[:, :, None, None] & take(valid_x)[:, None, :, None]
    return jnp.where(valid, out, jnp.asarray(0.0, dtype))


def pyramid_roi_align_patch(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    crop_size: Tuple[int, int],
    image_shape: Tuple[int, int],
    extrapolation_value: float = 0.0,
    *,
    group: int = 4,
    spill_slots: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched FPN RoIAlign with the patch-DMA kernel.

    Drop-in for :func:`pyramid_roi_align_gather_batched` (same args, same
    semantics up to f32-accumulation association). Requires square pooled
    crops, every level dim >= PATCH, and extrapolation 0 (the production
    contract); anything else falls back to the blocked-gather path.
    """
    ch, cw = crop_size
    b, n = boxes.shape[:2]
    shapes = tuple(f.shape[1:] for f in features)
    c = shapes[0][-1]
    widths_pre = np.array([sh[1] for sh in shapes], np.int32)
    if (ch != cw or extrapolation_value != 0.0
            or any(sh[0] < PATCH for sh in shapes)
            or int(widths_pre.max()) < PATCH_X):
        return pyramid_roi_align_gather_batched_blocked(
            features, boxes, crop_size, image_shape, extrapolation_value)
    pool = ch
    heights = np.array([sh[0] for sh in shapes], np.int32)
    widths = np.array([sh[1] for sh in shapes], np.int32)
    wmax = int(widths.max())
    row_offsets = np.concatenate([[0], np.cumsum(heights)[:-1]]).astype(np.int32)
    sizes = [int(sh[0] * sh[1]) for sh in shapes]
    total = int(np.sum(sizes))
    flat_offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)

    # height-concatenated width-padded table (shared layout with the
    # blocked path; XLA CSEs it across the classifier and mask stages)
    table = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, 0), (0, wmax - f.shape[2]), (0, 0)))
         for f in features],
        axis=1,
    )  # [B, sum(Hl), Wmax, C]

    flat_boxes = boxes.reshape(b * n, 4)
    geom = _sample_geometry(shapes, flat_boxes, crop_size, image_shape)
    (lvl_idx, valid_y, valid_x, top, bottom, y_lerp, left, right,
     x_lerp) = geom

    h_l = jnp.asarray(heights)[lvl_idx]
    w_l = jnp.asarray(widths)[lvl_idx]
    off_l = jnp.asarray(row_offsets)[lvl_idx]

    top_i = top.astype(jnp.int32)
    bot_i = bottom.astype(jnp.int32)
    left_i = left.astype(jnp.int32)
    right_i = right.astype(jnp.int32)

    # sample coords are monotonic along the pool axis, so the span is
    # last-bottom minus first-top (all corner indices pre-clamped to the
    # level dims)
    span_y = bot_i[:, -1] - top_i[:, 0]
    span_x = right_i[:, -1] - left_i[:, 0]
    # negative span = inverted box (y2 < y1): the patch origin below would
    # sit at the span's wrong end — route to the exact spill path
    fits = ((span_y >= 0) & (span_y <= PATCH - 1)
            & (span_x >= 0) & (span_x <= PATCH - 1))

    y0 = jnp.clip(top_i[:, 0], 0, h_l - PATCH)               # level-local
    # the column offset must be 8-aligned (sublane tiling of the DMA
    # source); align down — up to 7 cells of slack, covered by the wider
    # PATCH_X extent. The upper clamp is against the PADDED table width:
    # cols past a narrow level's edge read zero-padding that the weight
    # matrices never address.
    x0 = jnp.clip((left_i[:, 0] // 8) * 8, 0, wmax - PATCH_X)
    bi = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    # column start ships as x0/8 — the kernel multiplies by 8 so Mosaic can
    # prove sublane alignment of the DMA's column offset
    starts = jnp.stack([bi, y0 + off_l, x0 // 8], axis=1)
    # misfit ROIs would DMA out-of-level rows; pin their patch to the level
    # origin (values unused — their rows are overwritten by the spill path)
    starts = jnp.where(fits[:, None],
                       starts,
                       jnp.stack([bi, off_l, jnp.zeros_like(x0)], axis=1))

    dtype = table.dtype
    wy = _axis_patch_weights(top_i, bot_i, y_lerp, y0,
                             valid_y.astype(jnp.float32), dtype)
    wx = _axis_patch_weights(left_i, right_i, x_lerp, x0,
                             valid_x.astype(jnp.float32), dtype,
                             width=PATCH_X)

    bn = b * n
    pad = (-bn) % group
    if pad:
        starts = jnp.concatenate(
            [starts, jnp.zeros((pad, 3), jnp.int32)], axis=0)
        wy = jnp.concatenate([wy, jnp.zeros((pad, pool, PATCH), dtype)], 0)
        wx = jnp.concatenate([wx, jnp.zeros((pad, pool, PATCH_X), dtype)], 0)

    def fast_path(_):
        out = roi_pool_patches(
            table, starts, wy, wx, pool=pool, group=group,
            interpret=interpret)[:bn]
        # spill: compact misfit rows into a fixed-width side crop + scatter.
        # The row-flat view REUSES the height-concat table (level row
        # offset x padded width + level-local coords), so no second table
        # materializes: flat_idx = bi*Ht*Wmax + (off_l + y)*Wmax + x.
        misfit_flag, sel = jax.lax.top_k(
            (~fits).astype(jnp.int32), min(spill_slots, bn))
        ht = int(np.sum(heights))
        flat_rows = table.reshape(b * ht * wmax, c)
        wl_i = jnp.full((bn,), wmax, jnp.int32)
        off_i = bi * (ht * wmax) + off_l * wmax
        crops = _crop_listed(flat_rows, off_i, wl_i, geom, sel, pool, dtype)
        keep = (misfit_flag == 1)[:, None, None, None]
        out = out.at[sel].set(jnp.where(keep, crops, out[sel]))
        return out.reshape(b, n, pool, pool, c)

    def slow_path(_):
        return pyramid_roi_align_gather_batched_blocked(
            features, boxes, crop_size, image_shape, extrapolation_value)

    n_misfit = jnp.sum((~fits).astype(jnp.int32))
    return jax.lax.cond(
        n_misfit <= min(spill_slots, bn), fast_path, slow_path, operand=None)
