"""On-device training-sample preparation (the BASELINE north-star fusion).

The host-side numpy pipeline (``pipeline.py``, mirroring the reference
generator ``/root/reference/modal/Functions.py:675-847``) spends ~1 s/sample
decoding the sem-dist bit-field into dense ``[H, W, L, N]`` masks, zooming
them to the model resolution, and matching 262k anchors in Python — all on
the host. This module moves everything after file IO onto the TPU as ONE
jitted program with static shapes:

- **host** (``encode_sample``): read the image (PIL squash-resize — kept on
  host for bit-parity with the reference's ``scipy.misc.imresize``), read the
  ``.npz`` uint64 sem-dist map, downsample it with the *exact*
  ``scipy.ndimage.zoom(order=0)`` index map (nearest resize of the label map
  commutes with the pixelwise decode — proven by ``tests/test_device_prep``),
  and split it into low/high uint32 planes. ~10 ms/sample of residual host
  work vs ~1 s.
- **device** (``prepare_sample``): sem-dist bit-decode as pure elementwise
  uint32 ops (shift/popcount broadcast over ``[32, L, S, S]`` — VPU-bound,
  no gathers), bbox extraction via argmax scans, flip/jitter augmentation
  from a ``jax.random`` key, and the full RPN anchor matching (IoU matrix +
  quota subsampling via random-key ``top_k``) — the math of
  ``pipeline.build_rpn_targets`` with masked static shapes.

Output batches are bit-compatible with ``pipeline.make_training_sample``
(the numpy path stays as the oracle; equivalence is pinned by
``tests/test_device_prep.py``). Randomized choices (anchor subsampling, >G
GT subsampling) use the same *distribution* but different draws.

Limits: the sem-dist bit-field holds 32 object slots (reference
``utils.py:536`` skips index >= 32), so the decode is exact for any valid
map. Crowd annotations (negative class ids) never occur on the sem-dist
route (``decode_layer_masks`` emits class 1 only), so the crowd branch of
``build_rpn_targets`` is host-path-only.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import image as image_utils
from . import semdist
from .pipeline import TrainLoader

NOBJ = 32  # sem-dist object slots (bit-field width per 32-bit half)


def rle_budget_for(size: int) -> int:
    """Static run budget for the RLE-encoded upload of a [size, size] label
    map: 32 runs per row on average (a row's run count is bounded by twice
    the objects it crosses, and the bit-field holds 32 object slots, so 32/
    row is generous for real layouts). Capped at size² (every-pixel runs)."""
    return min(size * size, 32 * size)


# --------------------------------------------------------------------- host


def zoom0_indices(n_in: int, n_out: int) -> np.ndarray:
    """Source indices of ``scipy.ndimage.zoom(..., order=0)`` (grid_mode
    False): coordinate ``i * (n_in-1)/(n_out-1)``, nearest by
    ``floor(x + 0.5)``. Bit-exact vs scipy (tests/test_device_prep)."""
    if n_out <= 1 or n_in <= 1:
        return np.zeros((n_out,), np.int64)
    x = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    return np.clip(np.floor(x + 0.5).astype(np.int64), 0, n_in - 1)


def downsample_label_map(label_map: np.ndarray, size: int) -> np.ndarray:
    """Nearest-resize a [H, W] uint64 sem-dist map to [size, size] with the
    exact index map of the oracle path's mask zoom
    (``image_utils.resize_layer_masks``) — pixelwise decode commutes with
    nearest resize, so decoding the small map equals resizing the decoded
    masks."""
    h, w = label_map.shape
    return label_map[zoom0_indices(h, size)][:, zoom0_indices(w, size)]


def rle_encode_map(small: np.ndarray, budget: int):
    """Row-major RLE of a [S, S] uint64 label map for the H2D upload.

    Returns ``(starts [budget] int32, lo [budget] uint32, hi [budget]
    uint32, n_runs int32)``. Padding runs have ``start == S*S`` (zero
    length on device). When the map needs more than ``budget`` runs the
    arrays hold only the first ``budget`` runs — ``n_runs`` tells the
    loader to take the dense-upload path instead.

    Sem-dist maps are spatially coherent (objects are contiguous regions),
    so a 1024² map is typically a few thousand runs — ~20-40x fewer bytes
    on the tunneled host→device link than the 8 MB dense uint32 planes,
    which round 3 measured as the train-pipeline bottleneck (2353 ms/step
    of which ~85% was the encoded-batch upload)."""
    flat = small.ravel()
    change = np.flatnonzero(flat[1:] != flat[:-1]).astype(np.int64) + 1
    n_runs = change.shape[0] + 1
    starts = np.full((budget,), flat.size, np.int32)
    lo = np.zeros((budget,), np.uint32)
    hi = np.zeros((budget,), np.uint32)
    k = min(n_runs, budget)
    starts[0] = 0
    starts[1:k] = change[: k - 1]
    vals = flat[starts[:k].astype(np.int64)]
    lo[:k] = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi[:k] = (vals >> np.uint64(32)).astype(np.uint32)
    return starts, lo, hi, np.int32(n_runs)


def encode_sample(dataset, config, image_id: int,
                  dense_planes: bool = True) -> Optional[Dict[str, np.ndarray]]:
    """Light host-side encoding of one training sample (file IO + resize
    only). Returns None if the image has no objects (oracle-path parity:
    ``make_training_sample`` skips those).

    Carries BOTH upload formats of the label map: the RLE runs (small —
    what actually ships over the link in the common case) and the dense
    uint32 planes (the fallback when a sample's run count exceeds the
    static budget; also the equivalence oracle). The dispatch stream picks
    one per batch; the other never leaves the host.

    ``dense_planes=False`` (the loader's setting) defers the dense format:
    the dict carries the raw uint64 ``small_map`` instead of the two uint32
    planes, and the batch collate materializes planes only for the rare
    over-budget fallback batch — a fitting batch never pays the 16 MB/sample
    plane split + 64 MB/batch ``np.stack`` on the (1-core) host."""
    image = dataset.load_image(image_id)
    image, _, _, _ = image_utils.resize_image(image, config.image_size)

    info = dataset.image_info[image_id]
    label_map = semdist.load_layer_file(info["path"][:-4] + ".npz")
    # object count comes from the ORIGINAL-resolution labels (the oracle
    # decodes before resizing; a label vanishing under the resize must not
    # change N)
    n_objects = semdist.max_object_id(semdist.get_image_labels(label_map))
    if n_objects == 0:
        return None
    small = downsample_label_map(label_map, config.image_size)
    starts, lo, hi, n_runs = rle_encode_map(
        small, rle_budget_for(config.image_size))
    enc = {
        "image": np.ascontiguousarray(image, np.uint8),
        "run_starts": starts,
        "run_lo": lo,
        "run_hi": hi,
        "n_runs": n_runs,
        "n_objects": np.int32(n_objects),
    }
    if dense_planes:
        enc["label_lo"] = (small & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        enc["label_hi"] = (small >> np.uint64(32)).astype(np.uint32)
    else:
        enc["small_map"] = small
    return enc


def planes_from_small(small: np.ndarray):
    """uint64 label map → (lo, hi) uint32 planes (the dense-upload format)."""
    return ((small & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (small >> np.uint64(32)).astype(np.uint32))


# ------------------------------------------------------------------- device


def runs_to_planes(starts, lo, hi, size: int):
    """Reconstruct the dense [size, size] uint32 planes from RLE runs, on
    device. Padding runs (``start == size*size``) get zero count, so the
    static-budget padding is free. ``jnp.repeat`` with a static
    ``total_repeat_length`` keeps the program shape-static."""
    total = size * size
    counts = jnp.diff(starts, append=jnp.int32(total))
    plane_lo = jnp.repeat(lo, counts, total_repeat_length=total)
    plane_hi = jnp.repeat(hi, counts, total_repeat_length=total)
    return plane_lo.reshape(size, size), plane_hi.reshape(size, size)


def _decode_masks(label_lo, label_hi, n_objects, num_layers):
    """[NOBJ, L, S, S] uint8 occlusion-layer masks from the uint32 planes.

    Pure elementwise broadcast (no gathers): for object g, visibility is bit
    g of the low plane (channel 0); occlusion depth is 1 + popcount of the
    high plane's bits below g, clipped into channel ``min(depth, L-1)`` —
    exactly ``semdist.decode_layer_masks`` / the reference ``load_layer2``
    (``/root/reference/amodal_train.py:236-271``).
    """
    g = jnp.arange(NOBJ, dtype=jnp.uint32)[:, None, None, None]
    l = jnp.arange(num_layers, dtype=jnp.int32)[None, :, None, None]
    lo = label_lo[None, None, :, :]
    hi = label_hi[None, None, :, :]

    one = jnp.uint32(1)
    vis_bit = (lo >> g) & one
    invis_bit = (hi >> g) & one
    below = hi & ((one << g) - one)
    depth = jax.lax.population_count(below).astype(jnp.int32) + 1
    channel = jnp.minimum(depth, num_layers - 1)

    vis = (vis_bit == one) & (l == 0)
    invis = (invis_bit == one) & (channel == l)
    valid = (g.astype(jnp.int32) < n_objects)
    return ((vis | invis) & valid).astype(jnp.uint8)


def _amodal_union(label_lo, label_hi, n_objects):
    """[NOBJ, S, S] uint8 amodal (vis|invis) masks — union over layers."""
    g = jnp.arange(NOBJ, dtype=jnp.uint32)[:, None, None]
    both = (label_lo | label_hi)[None, :, :]
    bit = (both >> g) & jnp.uint32(1)
    valid = g.astype(jnp.int32) < n_objects
    return ((bit == 1) & valid).astype(jnp.uint8)


def _extract_boxes(amodal, key, jitter: bool):
    """[NOBJ, 4] f32 pixel boxes (y1, x1, y2, x2) with the reference's
    ±1/15 jitter (``/root/reference/utils.py:51``; pipeline.extract_bboxes).
    Empty masks give the zero box (span 0 → jitter is a no-op there too)."""
    s = amodal.shape[-1]
    any_y = amodal.max(axis=2)  # [NOBJ, S] rows with content
    any_x = amodal.max(axis=1)
    has = amodal.max(axis=(1, 2)) > 0
    y1 = jnp.argmax(any_y, axis=1)
    y2 = s - jnp.argmax(any_y[:, ::-1], axis=1)  # last index + 1
    x1 = jnp.argmax(any_x, axis=1)
    x2 = s - jnp.argmax(any_x[:, ::-1], axis=1)
    box = jnp.stack([y1, x1, y2, x2], axis=1).astype(jnp.float32)
    box = jnp.where(has[:, None], box, 0.0)
    if jitter:
        h = box[:, 2] - box[:, 0]
        w = box[:, 3] - box[:, 1]
        span = jnp.stack([h, w, h, w], axis=1)
        box = box + (jax.random.uniform(key, (NOBJ, 4)) * 2.0 - 1.0) * span / 15.0
        box = jnp.maximum(box, 0.0)
        # numpy stores boxes as int32 (truncation; non-negative → floor)
        box = jnp.floor(box)
    return box


def _iou_matrix(anchors, boxes):
    """[A, G] IoU, zero-area-safe (pipeline._np_iou math, f32)."""
    y1 = jnp.maximum(anchors[:, None, 0], boxes[None, :, 0])
    x1 = jnp.maximum(anchors[:, None, 1], boxes[None, :, 1])
    y2 = jnp.minimum(anchors[:, None, 2], boxes[None, :, 2])
    x2 = jnp.minimum(anchors[:, None, 3], boxes[None, :, 3])
    inter = jnp.maximum(y2 - y1, 0.0) * jnp.maximum(x2 - x1, 0.0)
    a1 = (anchors[:, 2] - anchors[:, 0]) * (anchors[:, 3] - anchors[:, 1])
    a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = a1[:, None] + a2[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def _subsample_to_quota(match, key, limit: int):
    """Randomly zero excess positives (> limit//2) then excess negatives
    (> limit - n_pos) — ``build_rpn_targets``'s rng.choice quotas as
    random-key top_k (uniform random subsets, jit-static shapes)."""
    a = match.shape[0]
    kp, kn = jax.random.split(key)

    pos = match == 1
    r = jax.random.uniform(kp, (a,))
    score = jnp.where(pos, r, jnp.inf)
    _, keep_idx = jax.lax.top_k(-score, limit // 2)
    keep = jnp.zeros((a,), bool).at[keep_idx].set(True)
    match = jnp.where(pos & ~keep, 0, match)

    n_pos = jnp.sum((match == 1).astype(jnp.int32))
    quota = limit - n_pos
    neg = match == -1
    r2 = jax.random.uniform(kn, (a,))
    score2 = jnp.where(neg, r2, jnp.inf)
    _, neg_idx = jax.lax.top_k(-score2, limit)
    keep_neg = jnp.zeros((a,), bool).at[neg_idx].set(
        jnp.arange(limit) < quota)
    return jnp.where(neg & ~keep_neg, 0, match)


def _rpn_targets(anchors, boxes, valid_gt, key, config):
    """(rpn_match [A] i32, rpn_deltas [A,4] f32 anchor-aligned) — the math
    of ``pipeline.build_rpn_targets`` (no-crowd route; see module doc)."""
    a = anchors.shape[0]
    # zero-area GT (collapsed by resize/jitter) are treated as absent —
    # the oracle's NaN guard
    nonzero = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    valid = valid_gt & nonzero
    has_gt = jnp.any(valid)

    iou = jnp.where(valid[None, :], _iou_matrix(anchors, boxes), -1.0)
    anchor_max = iou.max(axis=1)
    anchor_arg = iou.argmax(axis=1)

    match = jnp.where(anchor_max < 0.3, -1, 0).astype(jnp.int32)
    # the best anchor of each valid GT is forced positive (scatter; invalid
    # GT rows are routed out of bounds and dropped)
    best_per_gt = jnp.argmax(iou, axis=0)
    match = match.at[jnp.where(valid, best_per_gt, a)].set(1, mode="drop")
    match = jnp.where(anchor_max >= 0.7, 1, match)
    match = _subsample_to_quota(match, key, config.rpn_train_anchors_per_image)
    # no usable GT → every anchor negative, nothing sampled (oracle
    # pipeline.py:104-106 returns before the quota step)
    match = jnp.where(has_gt, match, -1)

    pos = match == 1
    gt = boxes[anchor_arg]  # [A, 4]
    gt_h = jnp.where(pos, gt[:, 2] - gt[:, 0], 1.0)
    gt_w = jnp.where(pos, gt[:, 3] - gt[:, 1], 1.0)
    a_h = anchors[:, 2] - anchors[:, 0]
    a_w = anchors[:, 3] - anchors[:, 1]
    deltas = jnp.stack(
        [
            (gt[:, 0] + 0.5 * gt_h - (anchors[:, 0] + 0.5 * a_h)) / a_h,
            (gt[:, 1] + 0.5 * gt_w - (anchors[:, 1] + 0.5 * a_w)) / a_w,
            jnp.log(gt_h / a_h),
            jnp.log(gt_w / a_w),
        ],
        axis=1,
    ) / jnp.asarray(config.rpn_bbox_std_dev, jnp.float32)
    deltas = jnp.where(pos[:, None], deltas, 0.0)
    return match, deltas


def _select_gt_slots(masks, boxes, n_objects, key, config):
    """Pack the NOBJ object slots into ``max_gt_instances`` GT slots.

    G >= NOBJ (the production shape: 50 >= 32): objects keep their order,
    zero-padded — identical layout to the oracle. G < NOBJ: random subset in
    random order when n > G (the oracle's rng.choice), identity order
    otherwise."""
    g_slots = config.max_gt_instances
    if g_slots >= NOBJ:
        pad = g_slots - NOBJ
        masks = jnp.pad(masks, ((0, pad), (0, 0), (0, 0), (0, 0)))
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        class_ids = (jnp.arange(g_slots) < n_objects).astype(jnp.int32)
        return masks, boxes, class_ids
    idx = jnp.arange(NOBJ, dtype=jnp.float32)
    valid = idx.astype(jnp.int32) < n_objects
    rand = jax.random.uniform(key, (NOBJ,))
    prio = jnp.where(
        valid,
        jnp.where(n_objects > g_slots, rand, idx / NOBJ),
        2.0 + idx,
    )
    sel = jnp.argsort(prio)[:g_slots]
    return (
        masks[sel],
        boxes[sel],
        (sel < n_objects).astype(jnp.int32),
    )


def prepare_sample(image_u8, label_lo, label_hi, n_objects, anchors, key,
                   *, config, augment: bool):
    """One encoded sample → the training batch dict of
    ``pipeline.make_training_sample``, entirely on device."""
    k_flip, k_jit, k_sel, k_rpn = jax.random.split(key, 4)

    if augment:
        do_flip = jax.random.bernoulli(k_flip)
        image_u8 = jnp.where(do_flip, image_u8[:, ::-1], image_u8)
        label_lo = jnp.where(do_flip, label_lo[:, ::-1], label_lo)
        label_hi = jnp.where(do_flip, label_hi[:, ::-1], label_hi)

    masks = _decode_masks(label_lo, label_hi, n_objects, config.num_layers)
    amodal = _amodal_union(label_lo, label_hi, n_objects)
    boxes = _extract_boxes(amodal, k_jit, jitter=augment)

    valid_obj = jnp.arange(NOBJ, dtype=jnp.int32) < n_objects
    rpn_match, rpn_deltas = _rpn_targets(
        anchors, boxes, valid_obj, k_rpn, config)

    masks_g, boxes_g, class_g = _select_gt_slots(
        masks, boxes, n_objects, k_sel, config)

    mean = jnp.asarray(config.mean_pixel, jnp.float32)
    return {
        "images": image_u8.astype(jnp.float32) - mean,
        "rpn_match": rpn_match,
        "rpn_deltas": rpn_deltas,
        "gt_class_ids": class_g,
        "gt_boxes": boxes_g / jnp.float32(config.image_size),
        "gt_masks": masks_g,
    }


def make_prepare_batch(config, augment: bool = True, mesh=None,
                       rle: bool = False):
    """Jitted ``(encoded batch dict, anchors [A,4], keys [B,2]) → batch
    dict``. ``lax.map`` over the batch bounds live temporaries to one
    sample's working set (the [NOBJ, L, S, S] decode broadcast).

    ``rle=True`` takes the run-length-encoded batch format
    (``run_starts``/``run_lo``/``run_hi`` instead of the dense planes) and
    reconstructs the planes on device first — same outputs, ~20-40x fewer
    bytes over the host→device link.

    On a >1-device ``mesh`` the program is SPMD over the batch axis —
    samples are per-device-independent, so each chip preps its own shard
    and the outputs land already laid out for the sharded train step
    (no resharding copy between prep and training)."""
    from ..parallel.mesh import batch_sharding, replicate

    def prepare_batch(batch, anchors, keys):
        def one(args):
            if rle:
                img, starts, rlo, rhi, n, key = args
                lo, hi = runs_to_planes(starts, rlo, rhi, config.image_size)
            else:
                img, lo, hi, n, key = args
            return prepare_sample(
                img, lo, hi, n, anchors, key, config=config, augment=augment)

        if rle:
            leaves = (batch["image"], batch["run_starts"], batch["run_lo"],
                      batch["run_hi"], batch["n_objects"], keys)
        else:
            leaves = (batch["image"], batch["label_lo"], batch["label_hi"],
                      batch["n_objects"], keys)
        return jax.lax.map(one, leaves)

    if mesh is not None and mesh.devices.size > 1:
        data_sh, repl = batch_sharding(mesh), replicate(mesh)
        return jax.jit(
            prepare_batch,
            in_shardings=(data_sh, repl, data_sh),
            out_shardings=data_sh,
        )
    return jax.jit(prepare_batch)


# ------------------------------------------------------------------- loader


class DevicePrepLoader(TrainLoader):
    """TrainLoader variant whose workers only do file IO + resize; the
    decode / bbox / RPN-target math runs on device via ``prepare_batch``.

    Drop-in: yields the same batch dicts (as device arrays). The host cost
    per sample falls from ~1 s (decode + zoom + anchor matching in numpy) to
    ~10 ms, so a 1-core host can feed the 370 ms/step batch-8 device step.
    """

    def __init__(self, *args, mesh=None, **kwargs):
        super().__init__(*args, **kwargs)
        self._multi = jax.process_count() > 1
        if self._multi:
            # multi-host: each process encodes its local dataset shard on
            # host (numpy), the encoded batches are assembled into GLOBAL
            # batch-sharded arrays (multihost.global_batch), and ONE SPMD
            # prep program runs over the global mesh — outputs land sharded
            # for the sharded train step, same as single-host SPMD prep.
            if mesh is None or mesh.devices.size != len(jax.devices()):
                raise ValueError(
                    "multi-process --device_prep needs the global device "
                    "mesh (pass mesh=make_mesh(), spanning all processes' "
                    "devices)")
        # fail fast on legacy datasets: without .npz maps every sample
        # would raise inside the workers and the containment loop would
        # skip-and-spin forever instead of surfacing the real problem
        import os
        ids = self.dataset.image_ids
        if len(ids):
            probe = self.dataset.image_info[int(ids[0])]["path"][:-4] + ".npz"
            if not os.path.exists(probe):
                raise ValueError(
                    "--device_prep needs sibling .npz sem-dist maps "
                    f"(missing: {probe}); this dataset appears to use the "
                    "legacy pickle .layer format — run scripts/"
                    "convert_dataset.py encode, or drop --device_prep")
        self._mesh = mesh
        self._rle_budget = rle_budget_for(self.config.image_size)
        # two compiled programs, built lazily: the RLE-upload one (the
        # common case) and the dense-upload fallback for batches where a
        # sample's run count exceeds the static budget. The dense program
        # only ever compiles if such a batch occurs.
        self._prepare_cache: dict = {}
        if self._multi:
            from ..parallel.mesh import replicate
            self._anchors_dev = jax.make_array_from_process_local_data(
                replicate(mesh), np.asarray(self.anchors))
        else:
            self._anchors_dev = jnp.asarray(self.anchors)
        # fold the process index into the key stream so each process's
        # shard draws independent augmentation / anchor-subsample keys
        self._key = jax.random.fold_in(
            jax.random.PRNGKey(int(self.rng.integers(2 ** 63))),
            jax.process_index())
        self._batch_idx = 0

    def _prepare_for(self, rle: bool):
        if rle not in self._prepare_cache:
            self._prepare_cache[rle] = make_prepare_batch(
                self.config, augment=self.augment, mesh=self._mesh, rle=rle)
        return self._prepare_cache[rle]

    def _collate(self, batch):
        """Stack without ever materializing the dense planes for a batch
        whose every sample fits the RLE budget (the common case) — they cost
        16 MB/sample of host memcpy on this 1-core host and never leave it.
        An over-budget batch reconstructs the planes from the raw uint64
        maps right here (rare; single-process only — multi-host filters
        overflow samples in ``_make_one_sample``)."""
        keys = ("image", "run_starts", "run_lo", "run_hi", "n_runs",
                "n_objects")
        out = {k: np.stack([b[k] for b in batch]) for k in keys}
        if int(out["n_runs"].max()) > self._rle_budget:
            planes = [planes_from_small(b["small_map"]) for b in batch]
            out["label_lo"] = np.stack([p[0] for p in planes])
            out["label_hi"] = np.stack([p[1] for p in planes])
        return out

    # the worker threads call this per image (base class hook)
    def _make_one_sample(self, image_id: int, rng):
        enc = encode_sample(
            self.dataset, self.config, image_id, dense_planes=False)
        if (enc is not None and self._multi
                and int(enc["n_runs"]) > self._rle_budget):
            # multi-host runs execute ONE SPMD prep program per run — a
            # per-batch dense fallback would desynchronize the processes'
            # compiled programs. Route the (pathological) overflow sample
            # through the loader's overflow-skip containment, which counts
            # these separately and warns when the drop rate is systematic.
            from .pipeline import SampleOverflowError
            raise SampleOverflowError(
                f"sample {image_id} needs {int(enc['n_runs'])} RLE runs > "
                f"budget {self._rle_budget}; skipped on multi-host runs")
        return enc

    def _dispatch_stream(self):
        for encoded in super().__iter__():
            key = jax.random.fold_in(self._key, self._batch_idx)
            self._batch_idx += 1
            keys = jax.random.split(key, self.batch_size)
            # ship the RLE runs when every sample fits the static budget
            # (the dense planes then never leave the host); else fall back
            # to the dense planes for the whole batch (single-process only —
            # multi-host filters overflow samples in _make_one_sample)
            rle = self._multi or bool(
                int(encoded["n_runs"].max()) <= self._rle_budget)
            if rle:
                batch = {k: encoded[k] for k in
                         ("image", "run_starts", "run_lo", "run_hi",
                          "n_objects")}
            else:
                batch = {k: encoded[k] for k in
                         ("image", "label_lo", "label_hi", "n_objects")}
            if self._multi:
                # per-process local batches → one global batch-sharded
                # array set; the SPMD prep program consumes it directly
                from ..parallel.multihost import global_batch
                batch = global_batch(batch, self._mesh)
                keys = global_batch(np.asarray(keys), self._mesh)
            yield self._prepare_for(rle)(batch, self._anchors_dev, keys)

    def __iter__(self):
        """Device-prefetching iterator: the host→device upload of the encoded
        sample (~3.4 MB: the uint8 image + ~0.4 MB of RLE runs — the dense
        planes would be another 8 MB) and the prep-program dispatch run on a
        background thread, so batch N+1's transfer overlaps the train step on
        batch N. The upload blocks the *calling* thread on this platform, so
        without the thread the transfer serializes with the step even though
        jit dispatch itself is async. Queue depth 1 bounds device memory to
        one extra prepared batch in flight."""
        import queue
        import threading

        inner = self._dispatch_stream()
        q: queue.Queue = queue.Queue(maxsize=1)
        stop = threading.Event()
        fail: list = []

        def put(item) -> bool:
            """Blocking put that stays responsive to stop; False if stopped."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def dispatcher():
            try:
                for item in inner:
                    if not put(item):
                        return
            except BaseException as e:  # surfaced on the consumer side
                fail.append(e)
            put(None)  # sentinel: stream exhausted (or failed — see fail)

        t = threading.Thread(target=dispatcher, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    if fail:
                        raise fail[0]
                    return
                yield item
        finally:
            stop.set()
            t.join(timeout=2.0)
