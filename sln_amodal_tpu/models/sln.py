"""SLNAmodal — the semantic layering network, as one jit-able flax module.

The TPU-native re-design of the reference ``MaskRCNN.predict`` graph
(``/root/reference/model.py:516-707``):

- one traced program per mode (inference / training) — no Python branching
  on data, no host round-trips mid-graph;
- every intermediate is static-shaped: proposals [R], ROI table [T],
  detections [D] with validity masks, replacing ``torch.nonzero`` filtering;
- per-image stages (proposal, target sampling, detection refine) are pure
  functions lifted over the batch with ``jax.vmap``; the heads run once over
  the folded [B·N, ...] ROI axis so conv/matmul work stays large for the MXU.

Reference quirks preserved (flags in Config where they matter):

- the GLM prior for the *inference* mask head is cropped with **pixel**
  coordinates where crop-and-resize expects normalized ones
  (``model.py:593``), which zeroes the prior for essentially every box;
  training uses normalized coords (``model.py:665``). Controlled by
  ``glm_prior_pixel_coords_at_inference`` (default True = reference).
- inference mask channel 1 is overwritten with sigmoid(sum of channels 1:)
  (``model.py:618``).
- the ``MAX_NUMB_RPNS`` re-cap after target sampling (``model.py:654-661``)
  never binds with the shipped 100-ROI table and is omitted.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..detect.detection import refine_detections
from ..detect.proposal import proposal_layer_batched
from ..detect.targets import RoiTargets, detection_target_layer
from ..ops.anchors import config_anchors
from ..ops.roi_align import (
    crop_and_resize_blocked,
    crop_and_resize_dense_batched,
    pyramid_roi_align_batched,
)
from .backbone import ResNetFPN
from .common import resize_bilinear, resize_bilinear_2d
from .deeplab import DeepLabV2MSC
from .heads import ClassifierHead, MaskHead, RefineHead, RPNHead


class InferenceOutputs(NamedTuple):
    detections: jnp.ndarray    # [B, D, 6] pixel coords, zero-padded
    det_valid: jnp.ndarray     # [B, D]
    masks: jnp.ndarray         # [B, D, 2m, 2m, C] (channel 1 = sigmoid sum)
    global_label: jnp.ndarray  # [B, H, W] upsampled GLM argmax


class DetectOutputs(NamedTuple):
    """Outputs of the ``detect()`` contract (reference ``model.py:464-514``
    returns only rois/class_ids/scores/masks — the GLM global label is
    computed and discarded there)."""

    detections: jnp.ndarray
    det_valid: jnp.ndarray
    masks: jnp.ndarray


class TrainingOutputs(NamedTuple):
    rpn_logits: jnp.ndarray        # [B, A, 2]
    rpn_deltas: jnp.ndarray        # [B, A, 4]
    targets: RoiTargets            # batched [B, T, ...]
    class_logits: jnp.ndarray      # [B, T, C]
    bbox_deltas: jnp.ndarray       # [B, T, C, 4]
    mask_logits: jnp.ndarray       # [B, T, 2m, 2m, C]
    refined: Any = None            # [B, T, 2m, 2m, C] when use_refine_head


class SLNAmodal(nn.Module):
    config: Config

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        self.fpn = ResNetFPN(cfg.backbone, cfg.fpn_channels, dtype=dtype)
        self.rpn = RPNHead(
            len(cfg.rpn_anchor_ratios), cfg.rpn_anchor_stride, dtype=dtype
        )
        self.classifier = ClassifierHead(cfg.num_classes, cfg.pool_size, dtype=dtype)
        self.mask = MaskHead(cfg.num_classes, dtype=dtype)
        self.glm = DeepLabV2MSC(cfg.glm_num_classes, scales=cfg.glm_scales,
                                dtype=dtype,
                                dilated_lowering=cfg.glm_dilated_lowering)
        if cfg.use_refine_head:
            self.amodal_refine = RefineHead(cfg.num_classes, dtype=dtype)
        # anchors carry the pipeline's f32-rounded values; staging through
        # float64 lets x64 mode keep full precision while the default f32
        # mode is unchanged (jnp downcasts to f32 when x64 is off)
        self._anchors = jnp.asarray(
            np.asarray(config_anchors(cfg), np.float64)
        )

    # ------------------------------------------------------------- pieces --

    def _rpn_all_levels(self, feats: Sequence[jnp.ndarray]):
        outs = [self.rpn(p) for p in feats]
        logits = jnp.concatenate([o[0] for o in outs], axis=1)
        probs = jnp.concatenate([o[1] for o in outs], axis=1)
        deltas = jnp.concatenate([o[2] for o in outs], axis=1)
        return logits, probs, deltas

    def _glm_prior(self, images: jnp.ndarray, need_label: bool = True):
        """Frozen DeepLab prior: probs+label channel at the GLM grid, and the
        full-resolution argmax label (model.py:535-543). ``need_label=False``
        skips the full-res label upsample (the detect() contract discards
        it)."""
        cfg = self.config
        h, w = images.shape[1:3]
        # cast to the compute dtype BEFORE the resize: the GLM consumes the
        # result in that dtype anyway, and a bf16 resize runs on the MXU
        # (no-op for f32/f64 parity modes)
        glm_in = resize_bilinear(
            images.astype(jnp.dtype(cfg.compute_dtype)),
            (cfg.glm_input_size, cfg.glm_input_size),
        )
        logits = self.glm(glm_in)                      # [B, g, g, 182] f32
        logits = jax.lax.stop_gradient(logits)
        probs = jax.nn.softmax(logits, axis=-1)
        label = jnp.argmax(probs, axis=-1)             # [B, g, g]
        prior = jnp.concatenate(
            [probs, label[..., None].astype(jnp.float32) / 255.0], axis=-1
        )                                              # [B, g, g, 183]
        if not need_label:
            return prior, None
        global_label = resize_bilinear_2d(label.astype(jnp.float32), (h, w))
        return prior, global_label

    def _proposals(self, rpn_probs, rpn_deltas, proposal_count):
        cfg = self.config
        # Proposals are training targets, not a gradient path: the reference
        # detaches ROI boxes before pooling (modals.py:81) and trains the RPN
        # only through its own losses. Stopping gradients here also keeps the
        # NMS selection loop out of reverse-mode autodiff.
        rpn_probs = jax.lax.stop_gradient(rpn_probs)
        rpn_deltas = jax.lax.stop_gradient(rpn_deltas)
        # batch-native: batched top_k/gathers + ONE batch-grid Pallas NMS
        # call (no per-image vmap body, no batch-1 special case — the b=1
        # slice of the batched program IS the single-image program)
        return proposal_layer_batched(
            rpn_probs,
            rpn_deltas,
            self._anchors,
            proposal_count=proposal_count,
            nms_threshold=cfg.rpn_nms_threshold,
            image_size=cfg.image_size,
            rpn_bbox_std_dev=cfg.rpn_bbox_std_dev,
            pre_nms_limit=cfg.pre_nms_limit,
            nms_impl=cfg.nms_impl,
        )

    def _classifier_on(self, feats_per_image, rois):
        """feats_per_image: 4-tuple of [B, Hl, Wl, C]; rois [B, R, 4]."""
        cfg = self.config
        b, r = rois.shape[:2]

        # batch-native: one flat-table gather over all images' pyramids
        # (vmap-lifting the per-image op measured ~2x per-image cost at b=8)
        crops = pyramid_roi_align_batched(
            feats_per_image, rois, (cfg.pool_size, cfg.pool_size),
            (cfg.image_size, cfg.image_size), impl=cfg.roi_align_impl,
        )                                                    # [B,R,p,p,C]
        crops = crops.reshape(b * r, *crops.shape[2:])
        logits, probs, deltas = self.classifier(crops)
        return (
            logits.reshape(b, r, -1),
            probs.reshape(b, r, -1),
            deltas.reshape(b, r, cfg.num_classes, 4),
        )

    def _mask_on(self, feats_per_image, rois, glm_prior, glm_boxes):
        """Mask head over [B, N] boxes. ``glm_boxes`` are the coords used for
        the GLM prior crop (may deliberately be pixel coords — see module
        docstring). ``glm_prior=None`` feeds exact-zero prior crops — used by
        the detect-only fast path when the reference's pixel-coords quirk
        makes every crop 0 anyway."""
        cfg = self.config
        b, n = rois.shape[:2]
        m = cfg.mask_pool_size

        fpn_crops = pyramid_roi_align_batched(
            feats_per_image, rois, (m, m), (cfg.image_size, cfg.image_size),
            impl=cfg.roi_align_impl,
        )

        if glm_prior is None:
            glm_crops = jnp.zeros(
                (b, n, m, m, cfg.glm_num_classes + 1), fpn_crops.dtype
            )
        else:
            impl = cfg.glm_crop_impl
            if impl == "auto":
                impl = ("dense" if jax.default_backend() in ("tpu", "axon")
                        else "gather")
            if impl == "dense":
                # the prior table is small (65^2): two separable-
                # interpolation einsums beat the bandwidth-ceiling gather
                glm_crops = crop_and_resize_dense_batched(
                    glm_prior, glm_boxes, (m, m))
            else:
                # crop_and_resize is already batch-native via box_indices
                glm_crops = crop_and_resize_blocked(
                    glm_prior, glm_boxes.reshape(b * n, 4),
                    jnp.repeat(jnp.arange(b, dtype=jnp.int32), n), (m, m),
                ).reshape(b, n, m, m, -1)

        fpn_crops = fpn_crops.reshape(b * n, m, m, -1)
        glm_crops = glm_crops.reshape(b * n, m, m, -1)
        logits, _ = self.mask(fpn_crops, glm_crops)
        return logits.reshape(b, n, *logits.shape[1:])

    # -------------------------------------------------------------- modes --

    def __call__(self, images: jnp.ndarray, windows: jnp.ndarray) -> InferenceOutputs:
        return self.infer(images, windows)

    def infer(self, images: jnp.ndarray, windows: jnp.ndarray) -> InferenceOutputs:
        """Full inference graph. images [B,H,W,3] molded; windows [B,4] px."""
        return self._infer_impl(images, windows, detect_only=False)

    def infer_detect_only(
        self, images: jnp.ndarray, windows: jnp.ndarray
    ) -> DetectOutputs:
        """Inference graph for the ``detect()`` output contract only —
        output-identical to :meth:`infer` restricted to
        detections/det_valid/masks; the full-resolution global argmax label
        (computed but discarded by the reference's ``detect()``,
        ``model.py:464-514``) is not materialized.

        When ``config.glm_elide_at_inference`` is additionally set, the
        frozen DeepLab-MSC forward (the dominant inference cost) is skipped
        and the mask head receives exact-zero prior crops — the value the
        reference's pixel-coords quirk (``model.py:591``) produces for every
        interior detection box. NEAR-parity: boxes touching the top/left
        image edge (y1 or x1 <= 1px, where y1·(H-1) still lands inside the
        prior grid under the normalized-coords misinterpretation) sample the
        prior's first row/column, so their masks can differ. See the flag's
        doc in config.py.
        """
        return self._infer_impl(images, windows, detect_only=True)

    def _infer_impl(self, images, windows, *, detect_only: bool):
        cfg = self.config
        p2, p3, p4, p5, p6 = self.fpn(images)
        _, rpn_probs, rpn_deltas = self._rpn_all_levels((p2, p3, p4, p5, p6))
        skip_glm = (
            detect_only
            and cfg.glm_prior_pixel_coords_at_inference
            and cfg.glm_elide_at_inference
        )
        if skip_glm:
            glm_prior, global_label = None, None
        elif detect_only:
            glm_prior, _ = self._glm_prior(images, need_label=False)
            global_label = None
        else:
            glm_prior, global_label = self._glm_prior(images)

        rois, roi_valid = self._proposals(
            rpn_probs, rpn_deltas, cfg.post_nms_rois_inference
        )

        _, probs, deltas = self._classifier_on((p2, p3, p4, p5), rois)

        def refine_one(rois_i, valid_i, probs_i, deltas_i, window_i):
            return refine_detections(
                rois_i, valid_i, probs_i, deltas_i,
                (window_i[0], window_i[1], window_i[2], window_i[3]),
                image_size=cfg.image_size,
                bbox_std_dev=cfg.rpn_bbox_std_dev,
                max_instances=cfg.detection_max_instances,
                min_confidence=cfg.detection_min_confidence,
                use_nms=cfg.use_nms,
                nms_threshold=cfg.detection_nms_threshold,
            )

        detections, det_valid = jax.vmap(refine_one)(
            rois, roi_valid, probs, deltas, windows.astype(jnp.float32)
        )

        det_boxes_px = jnp.clip(detections[..., :4], 0.0, float(cfg.image_size))
        det_boxes_norm = det_boxes_px / float(cfg.image_size)

        if cfg.glm_prior_pixel_coords_at_inference:
            glm_boxes = det_boxes_px       # reference bug: pixel coords
        else:
            glm_boxes = det_boxes_norm

        mask_logits = self._mask_on(
            (p2, p3, p4, p5), det_boxes_norm, glm_prior, glm_boxes
        )

        # channel 1 := sigmoid(sum of layer channels) (model.py:618)
        layer_sum = jax.nn.sigmoid(jnp.sum(mask_logits[..., 1:], axis=-1))
        masks = mask_logits.at[..., 1].set(layer_sum)

        if detect_only:
            return DetectOutputs(detections, det_valid, masks)
        return InferenceOutputs(detections, det_valid, masks, global_label)

    def train_step_outputs(
        self,
        rng: jax.Array,
        images: jnp.ndarray,
        gt_class_ids: jnp.ndarray,
        gt_boxes: jnp.ndarray,
        gt_masks: jnp.ndarray,
    ) -> TrainingOutputs:
        """Training forward graph.

        gt_class_ids [B,G]; gt_boxes [B,G,4] normalized; gt_masks [B,G,L,H,W].
        """
        cfg = self.config
        p2, p3, p4, p5, p6 = self.fpn(images)
        rpn_logits, rpn_probs, rpn_deltas = self._rpn_all_levels((p2, p3, p4, p5, p6))
        glm_prior, _ = self._glm_prior(images)

        rois, roi_valid = self._proposals(
            rpn_probs, rpn_deltas, cfg.post_nms_rois_training
        )

        b = images.shape[0]
        keys = jax.random.split(rng, b)

        def sample_one(key, rois_i, valid_i, ids_i, boxes_i, masks_i):
            return detection_target_layer(
                key, rois_i, valid_i, ids_i, boxes_i, masks_i,
                train_rois=cfg.train_rois_per_image,
                roi_positive_ratio=cfg.roi_positive_ratio,
                mask_shape=cfg.mask_shape,
                bbox_std_dev=cfg.bbox_std_dev,
            )

        targets = jax.vmap(sample_one)(
            keys, rois, roi_valid, gt_class_ids, gt_boxes, gt_masks
        )

        sampled = jax.lax.stop_gradient(targets.rois)
        class_logits, _, bbox_deltas = self._classifier_on((p2, p3, p4, p5), sampled)
        mask_logits = self._mask_on((p2, p3, p4, p5), sampled, glm_prior, sampled)

        refined = None
        if cfg.use_refine_head:
            # Dead-path seam in the reference (model.py:698-703): image crop
            # /140 ‖ mask logits ×2 ‖ GLM-label crop → refine head.
            bsz, t = sampled.shape[:2]
            mh = cfg.mask_shape[0]

            def crop_img(img_i, rois_i):
                return crop_and_resize_blocked(
                    img_i[None] / 140.0, rois_i, jnp.zeros((t,), jnp.int32), (mh, mh)
                )

            img_crop = jax.vmap(crop_img)(images, sampled)

            def crop_lab(prior_i, rois_i):
                return crop_and_resize_blocked(
                    prior_i[None, ..., -1:], rois_i, jnp.zeros((t,), jnp.int32),
                    (mh, mh),
                )

            lab_crop = jax.vmap(crop_lab)(glm_prior, sampled)
            mask_small = jax.lax.stop_gradient(mask_logits)  # 2m == mask_shape
            fused = jnp.concatenate(
                [img_crop, mask_small, mask_small, lab_crop], axis=-1
            )
            refined = self.amodal_refine(fused.reshape(bsz * t, *fused.shape[2:]))
            refined = refined.reshape(bsz, t, *refined.shape[1:])

        return TrainingOutputs(
            refined=refined,
            rpn_logits=rpn_logits,
            rpn_deltas=rpn_deltas,
            targets=targets,
            class_logits=class_logits,
            bbox_deltas=bbox_deltas,
            mask_logits=mask_logits,
        )


def create_model(config: Config) -> SLNAmodal:
    return SLNAmodal(config)


def init_params(config: Config, rng: jax.Array):
    """Initialize parameters by tracing the inference graph on one image
    (or the training graph when optional training-only heads are enabled,
    so their params materialize)."""
    size = config.image_size
    model = SLNAmodal(config)
    images = jnp.zeros((1, size, size, 3), jnp.float32)
    if config.use_refine_head:
        g, l = config.max_gt_instances, config.num_layers
        return model.init(
            rng,
            jax.random.PRNGKey(0),
            images,
            jnp.zeros((1, g), jnp.int32),
            jnp.zeros((1, g, 4), jnp.float32),
            jnp.zeros((1, g, l, size, size), jnp.float32),
            method=SLNAmodal.train_step_outputs,
        )
    windows = jnp.asarray([[0, 0, size, size]], jnp.float32)
    return model.init(rng, images, windows)
