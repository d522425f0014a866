"""Configuration system.

Replaces the reference's class-attribute ``Config`` pattern
(``/root/reference/config.py:19-188``) with a frozen dataclass. Unlike the
reference — which mutates ``config.NUM_CLASSES`` after model construction to
retype the whole pipeline (``/root/reference/amodal_train.py:606``) — the
layer count is a first-class knob here (``num_layers``), and configs are
immutable; derive variants with :meth:`Config.replace`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class Config:
    """Model / training / inference configuration.

    Defaults mirror the reference's live values (``/root/reference/config.py``
    plus the ``Amodalfig`` / surgery overrides in
    ``/root/reference/amodal_train.py:38-54,566-574,606``).
    """

    name: str = "coco"

    # --- classes & layers -------------------------------------------------
    # The reference ends up with NUM_CLASSES = 2 (bg + foreground) after head
    # surgery (amodal_train.py:606); the mask head then emits
    # num_classes channels of which channels 1: are occlusion-depth layers.
    num_classes: int = 2

    # --- image geometry ---------------------------------------------------
    image_size: int = 1024            # IMAGE_MAX_DIM; squash-resized square
    image_min_dim: int = 800
    image_padding: bool = True
    mean_pixel: Tuple[float, float, float] = (123.7, 116.8, 103.9)

    # --- backbone / FPN ---------------------------------------------------
    backbone: str = "resnet101"
    backbone_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    fpn_channels: int = 256

    # --- anchors ----------------------------------------------------------
    rpn_anchor_scales: Tuple[int, ...] = (32, 64, 128, 256, 512)
    rpn_anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    rpn_anchor_stride: int = 1

    # --- proposals --------------------------------------------------------
    rpn_nms_threshold: float = 0.7
    pre_nms_limit: int = 6000
    post_nms_rois_training: int = 1000
    post_nms_rois_inference: int = 1000
    rpn_train_anchors_per_image: int = 256
    max_num_rois_heads: int = 500     # MAX_NUMB_RPNS cap before heads

    # --- ROI heads ----------------------------------------------------------
    train_rois_per_image: int = 100
    roi_positive_ratio: float = 0.7
    pool_size: int = 7
    mask_pool_size: int = 16
    mask_shape: Tuple[int, int] = (32, 32)
    # GLM prior pooling: DeepLab probs are pooled at mask_pool_size from a
    # 65x65-class map region (model.py:593,665 use pool 16 over (65,65)).
    glm_num_classes: int = 182
    glm_input_size: int = 513
    # MSC extra scales (reference: (0.5, 0.75) + the base scale, max-fused).
    # () runs single-scale — ~2x faster GLM at some accuracy cost (non-parity).
    glm_scales: Tuple[float, ...] = (0.5, 0.75)
    # Lowering of the trunk's 3x3 dilated convs (layer4 r=2, layer5 r=4):
    # 'conv' = XLA kernel_dilation, 's2b' = space-to-batch dense conv,
    # 'tapmm' = one [BHW,Cin]x[Cin,9Cout] matmul + shifted accumulation.
    # Same math modulo f32 summation order (tests/test_dilated_lowering.py);
    # pick by measurement on the target chip (scripts/profile_dilated.py).
    glm_dilated_lowering: str = "conv"

    max_gt_instances: int = 50

    # --- bbox regression --------------------------------------------------
    rpn_bbox_std_dev: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)
    bbox_std_dev: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)

    # --- detection --------------------------------------------------------
    use_nms: bool = False             # reference ships USE_NMS=False
    detection_max_instances: int = 100  # top-100 kept (Functions.py:530-532)
    detection_min_confidence: float = 0.0  # InferenceConfig sets 0
    detection_nms_threshold: float = 0.3

    # Extension seams (dormant in the reference — model.py:145-146 inits
    # layer_decoder/amodal_refine to None and never assigns them; the seams
    # are preserved here as optional modules).
    use_refine_head: bool = False

    # Reference quirk (model.py:593): at inference the GLM prior is cropped
    # with pixel coords where crop_and_resize expects normalized ones,
    # zeroing the prior. True = reproduce the reference; False = fixed.
    glm_prior_pixel_coords_at_inference: bool = True

    # Fast mode: skip the frozen DeepLab forward entirely on the detect()
    # path and feed exact-zero prior crops to the mask head. NEAR-parity:
    # under the pixel-coords quirk the prior crop is zero for every
    # interior box, but detections touching the top/left image edge
    # (y1 <= 1px or x1 <= 1px) sample the prior's first row/column —
    # those boxes' masks can differ from the reference. Detections, boxes
    # and scores are always identical. Off by default (exact parity).
    glm_elide_at_inference: bool = False

    # --- training ---------------------------------------------------------
    batch_size: int = 1
    steps_per_epoch: int = 2500
    validation_steps: int = 100
    learning_rate: float = 0.001
    learning_momentum: float = 0.9
    weight_decay: float = 0.0001
    gradient_clip_norm: float = 5.0

    # --- compute ----------------------------------------------------------
    compute_dtype: str = "bfloat16"   # conv/matmul compute dtype on TPU
    param_dtype: str = "float32"
    nms_impl: str = "auto"            # 'pallas' | 'xla' | 'auto' (pallas on TPU)
    # RoIAlign forward for the FPN heads: 'blocked' = footprint-blocked XLA
    # gather, 'patch' = Pallas patch-DMA kernel (ops/roi_patch_pallas.py),
    # 'auto' = patch on TPU / blocked elsewhere. The backward is the MXU
    # einsum custom-VJP either way.
    roi_align_impl: str = "auto"
    # GLM-prior crop for the mask head: 'gather' = blocked-gather
    # crop_and_resize, 'dense' = separable-einsum dense crop of the small
    # 65^2 prior table (MXU work instead of bandwidth-ceiling gathers),
    # 'auto' = dense on TPU / gather elsewhere.
    glm_crop_impl: str = "auto"

    # ----------------------------------------------------------------------
    @property
    def num_layers(self) -> int:
        """Occlusion-depth layer channels (reference: NUM_CLASSES - 1)."""
        return self.num_classes - 1

    @property
    def image_shape(self) -> Tuple[int, int, int]:
        return (self.image_size, self.image_size, 3)

    @property
    def backbone_shapes(self) -> Tuple[Tuple[int, int], ...]:
        return tuple(
            (int(math.ceil(self.image_size / s)), int(math.ceil(self.image_size / s)))
            for s in self.backbone_strides
        )

    @property
    def num_anchors(self) -> int:
        per_loc = len(self.rpn_anchor_ratios)
        return sum(
            (h // self.rpn_anchor_stride) * (w // self.rpn_anchor_stride) * per_loc
            for (h, w) in self.backbone_shapes
        )

    @property
    def mask_head_in_channels(self) -> int:
        """Mask head conv1 input channels: FPN + GLM probs + argmax channel.

        Reference: 439 = 256 + 182 + 1 (amodal_train.py:607).
        """
        return self.fpn_channels + self.glm_num_classes + 1

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def display(self) -> str:
        """Human-readable dump (reference ``Config.display``)."""
        lines = ["", "Configurations:"]
        for f in dataclasses.fields(self):
            lines.append("{:30} {}".format(f.name, getattr(self, f.name)))
        for p in ("num_layers", "image_shape", "backbone_shapes", "num_anchors"):
            lines.append("{:30} {}".format(p, getattr(self, p)))
        text = "\n".join(lines) + "\n"
        print(text)
        return text


def training_config(**overrides) -> Config:
    """Config used for training (reference ``Amodalfig``)."""
    return Config(**overrides)


def inference_config(**overrides) -> Config:
    """Config used for evaluation/inference (reference ``InferenceConfig``:
    batch 1, DETECTION_MIN_CONFIDENCE = 0)."""
    base = dict(batch_size=1, detection_min_confidence=0.0)
    base.update(overrides)
    return Config(**base)
