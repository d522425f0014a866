"""Greedy NMS as a Pallas TPU kernel.

Exact same semantics as :func:`sln_amodal_tpu.ops.nms.nms_sorted` (greedy over
score-sorted boxes, legacy +1 IoU, suppress at ``iou > thr``) but restructured
for the TPU vector unit instead of a 1000-step scalar loop:

- boxes are processed in tiles of 128 (the VPU lane width);
- a tile is first suppressed by the *surviving* boxes of all previous tiles,
  evaluated in 2048-row blocks ([2048, 128] IoU per block, rows masked to
  finalized tiles) — block-granular passes, because sequential loop-body
  overhead, not VPU math, dominates this kernel (3.2 ms as a per-tile-pair
  loop vs 1.3 ms blocked, measured on v5e at 6000 boxes);
- within a tile, survivors are resolved by iterating the suppression
  fixpoint ``x[j] = init[j] & ~any_{i<j}(iou[i,j] > t & x[i])``. The
  dependency graph is a DAG (strict index order), so the fixpoint is unique
  and equals the sequential greedy result; iteration count adapts to the
  actual suppression-chain depth (typically 2-4) instead of always paying
  1000 sequential steps.

The kernel emits the aliveness mask; index packing happens in XLA outside.
Everything lives in VMEM (6k boxes ≈ 96 KB).

Batching: :func:`nms_sorted_pallas_batched` runs B images through ONE
``pallas_call`` whose grid dimension walks the batch — same kernel body;
the BlockSpec index map hands each grid step its image's row range. The
per-image :func:`nms_sorted_pallas` is the B=1 slice of it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _iou_tile(a: jnp.ndarray, b: jnp.ndarray, plus_one: bool) -> jnp.ndarray:
    """IoU matrix [Ta, Tb] between two box tiles ([T, 4] each).

    Uses only basic slices (Mosaic lowers mixed int/None indexing to an
    unsupported gather)."""
    add = 1.0 if plus_one else 0.0
    ay1, ax1, ay2, ax2 = (a[:, i : i + 1] for i in range(4))        # [Ta, 1]
    by1, bx1, by2, bx2 = (b[:, i : i + 1].T for i in range(4))      # [1, Tb]
    y1 = jnp.maximum(ay1, by1)
    x1 = jnp.maximum(ax1, bx1)
    y2 = jnp.minimum(ay2, by2)
    x2 = jnp.minimum(ax2, bx2)
    inter = jnp.maximum(y2 - y1 + add, 0.0) * jnp.maximum(x2 - x1 + add, 0.0)
    area_a = (ay2 - ay1 + add) * (ax2 - ax1 + add)                  # [Ta, 1]
    area_b = (by2 - by1 + add) * (bx2 - bx1 + add)                  # [1, Tb]
    union = area_a + area_b - inter
    return inter / jnp.where(union != 0, union, 1.0)


def _nms_kernel(boxes_ref, valid_ref, alive_ref, alive_col_ref, *,
                iou_threshold: float, plus_one: bool, suppress_at_equal: bool):
    n = boxes_ref.shape[0]
    num_tiles = n // TILE
    thr = jnp.float32(iou_threshold)

    def hit(iou):
        return iou >= thr if suppress_at_equal else iou > thr

    # row index within a tile, [T, 1] and [1, T] iotas for the triangular mask
    row = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    strict_upper = row < col

    # Cross-tile suppression runs in CROSS-row blocks: one [CROSS, T] VPU
    # pass per block instead of the O(num_tiles) loop of [T, T] passes per
    # tile — the old kernel's 3.2 ms was loop-iteration overhead (~1100
    # sequential bodies), not VPU math. CROSS is sized so the fused IoU
    # temporaries (~8 live [CROSS, T] f32 arrays) stay within the 16 MB
    # VMEM scoped limit (a full [n, T] pass OOMs at n=6016).
    tiles = n // TILE
    if tiles > 16:
        num_cross = -(-tiles // 16)
        cross = (tiles // num_cross) * TILE  # exact: wrapper pads to equal blocks
    else:
        num_cross, cross = 1, n
    chunk_row = jax.lax.broadcasted_iota(jnp.int32, (cross, TILE), 0)

    alive_ref[:, :] = valid_ref[:, :]

    def tile_body(k, _):
        tb = boxes_ref[pl.ds(k * TILE, TILE), :]
        init = alive_ref[pl.ds(k, 1), :][0]  # [T] f32 0/1

        # alive_col rows >= k*TILE are stale; the row mask zeroes them out.
        # fori_loop (not unroll): one block's fused IoU temporaries live at
        # a time, keeping the VMEM stack under the 16 MB scoped limit.
        def cross_body(c, sup):
            cb = boxes_ref[pl.ds(c * cross, cross), :]
            ca = alive_col_ref[pl.ds(c * cross, cross), :]
            iou_c = _iou_tile(cb, tb, plus_one)               # [CROSS, T]
            prev = hit(iou_c) & (chunk_row + c * cross < k * TILE)
            return jnp.maximum(
                sup, jnp.max(jnp.where(prev, ca, 0.0), axis=0)
            )

        sup = jax.lax.fori_loop(
            0, num_cross, cross_body, jnp.zeros((TILE,), jnp.float32)
        )
        init = init * (1.0 - jnp.minimum(sup, 1.0))

        # --- within-tile fixpoint (unique on the strict-order DAG) ---
        # (recomputed [T, T] — Mosaic has no dynamic_slice on values)
        iou_tt = _iou_tile(tb, tb, plus_one)
        mask = jnp.where(hit(iou_tt) & strict_upper, 1.0, 0.0)  # [T, T]

        def fix_cond(state):
            x, changed = state
            return changed

        def fix_body(state):
            x, _ = state
            suppressed = jnp.max(mask * x[:, None], axis=0)     # [T]
            new_x = init * (1.0 - jnp.minimum(suppressed, 1.0))
            return new_x, jnp.any(new_x != x)

        x, _ = jax.lax.while_loop(fix_cond, fix_body, (init, jnp.bool_(True)))
        alive_ref[pl.ds(k, 1), :] = x[None, :]
        alive_col_ref[pl.ds(k * TILE, TILE), :] = x[:, None]
        return 0

    jax.lax.fori_loop(0, num_tiles, tile_body, 0)


def _padded_n(n: int, batched: bool = False) -> int:
    """Row padding for the blocked kernel layout. Two joint constraints
    (padded rows have valid=0 and never affect survivors):

    - the cross-suppression pass splits the tiles into ceil(tiles/16) EQUAL
      blocks, so ``tiles % ceil(tiles/16) == 0`` (the kernel's fori_loop
      covers exactly ``num_cross * cross`` rows — a ragged tail would
      silently escape suppression);
    - when the call is batched (b > 1), Mosaic requires the second-minor
      block dim divisible by 8, and the [tiles, TILE] valid/alive blocks of
      the [b*tiles, TILE] layout are no longer exempt-by-equality, so
      ``tiles % 8 == 0``. (The production 6000-box shape pads to 48 tiles
      and satisfies this already; tiny-config shapes like 512 boxes / 4
      tiles crashed the lowering before this search.)
    """
    tiles = max(1, -(-n // TILE))
    while True:
        ok = not batched or tiles % 8 == 0
        if ok and tiles > 16:
            ok = tiles % (-(-tiles // 16)) == 0
        if ok:
            return tiles * TILE
        tiles += 1


def _pack_keep(alive: jnp.ndarray, max_outputs: int, pad_value: int):
    """Pack surviving indices (in score order) into ``max_outputs`` slots.

    ``alive``: [..., n] bool. Returns (keep [..., max_outputs] int32 padded
    with ``pad_value``, keep_valid [..., max_outputs] bool). Batched over
    any leading dims with native ops (no vmap)."""
    n = alive.shape[-1]
    rank = jnp.cumsum(alive.astype(jnp.int32), axis=-1) - 1
    take = alive & (rank < max_outputs)
    slots = jnp.where(take, rank, max_outputs)  # overflow bin, sliced off
    src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), alive.shape)
    keep = jnp.full(alive.shape[:-1] + (max_outputs + 1,), pad_value,
                    jnp.int32)
    if alive.ndim == 1:
        keep = keep.at[slots].set(src)
    else:
        flat_slots = slots.reshape(-1, n)
        flat_src = src.reshape(-1, n)
        rows = jnp.arange(flat_slots.shape[0], dtype=jnp.int32)[:, None]
        keep = keep.reshape(-1, max_outputs + 1).at[rows, flat_slots].set(
            flat_src).reshape(keep.shape)
    keep = keep[..., :max_outputs]
    n_kept = jnp.minimum(jnp.sum(alive.astype(jnp.int32), axis=-1),
                         max_outputs)
    keep_valid = jnp.arange(max_outputs) < n_kept[..., None]
    return keep, keep_valid


@functools.partial(
    jax.jit,
    static_argnames=("max_outputs", "iou_threshold", "plus_one",
                     "suppress_at_equal", "pad_value", "interpret"),
)
def nms_sorted_pallas_batched(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    max_outputs: int,
    iou_threshold: float,
    plus_one: bool = True,
    suppress_at_equal: bool = False,
    pad_value: int = -1,
    interpret: bool = False,
):
    """Batched :func:`nms_sorted_pallas`: boxes [B, N, 4], valid [B, N].

    ONE ``pallas_call`` whose grid dimension walks the batch — the kernel
    body is byte-identical to the per-image one; grid step ``i`` maps to
    image ``i``'s row range of the [B·n_pad, 4] layout via the BlockSpec
    index map, so images pipeline through the same VMEM working set instead
    of paying per-image dispatch (the round-3 path vmapped the per-image
    kernel, which the batching rule lifts less efficiently — the b=1
    special case in models/sln.py existed only to dodge that 2× cost).

    Scratch reuse across grid steps is safe by construction: tile k's
    cross-suppression pass masks scratch rows ≥ k·TILE as stale, and rows
    < k·TILE were rewritten by THIS image's earlier tiles.

    Returns (keep [B, max_outputs] int32, keep_valid [B, max_outputs])."""
    b, n = boxes.shape[:2]
    n_pad = _padded_n(n, batched=b > 1)
    tiles = n_pad // TILE
    boxes_p = (
        jnp.zeros((b, n_pad, 4), jnp.float32)
        .at[:, :n].set(boxes.astype(jnp.float32))
        .reshape(b * n_pad, 4)
    )
    valid_p = (
        jnp.zeros((b, n_pad), jnp.float32)
        .at[:, :n].set(valid.astype(jnp.float32))
        .reshape(b * tiles, TILE)
    )

    alive = pl.pallas_call(
        functools.partial(
            _nms_kernel,
            iou_threshold=float(iou_threshold),
            plus_one=plus_one,
            suppress_at_equal=suppress_at_equal,
        ),
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b * tiles, TILE), jnp.float32),
        in_specs=[
            pl.BlockSpec((n_pad, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tiles, TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tiles, TILE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_pad, 1), jnp.float32)],
        interpret=interpret,
    )(boxes_p, valid_p)

    alive = alive.reshape(b, n_pad)[:, :n] > 0.5
    return _pack_keep(alive, max_outputs, pad_value)


@functools.partial(
    jax.jit,
    static_argnames=("max_outputs", "iou_threshold", "plus_one",
                     "suppress_at_equal", "pad_value", "interpret"),
)
def nms_sorted_pallas(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    max_outputs: int,
    iou_threshold: float,
    plus_one: bool = True,
    suppress_at_equal: bool = False,
    pad_value: int = -1,
    interpret: bool = False,
):
    """Drop-in replacement for :func:`ops.nms.nms_sorted` (same contract).
    The batch-1 slice of :func:`nms_sorted_pallas_batched`."""
    keep, keep_valid = nms_sorted_pallas_batched(
        boxes[None], valid[None], max_outputs=max_outputs,
        iou_threshold=iou_threshold, plus_one=plus_one,
        suppress_at_equal=suppress_at_equal, pad_value=pad_value,
        interpret=interpret,
    )
    return keep[0], keep_valid[0]
