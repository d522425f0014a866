"""High-level inference API — the reference's ``MaskRCNN.detect``
(``/root/reference/model.py:464-514``) as a thin host wrapper around one
jitted TPU program.

The device program (``SLNAmodal.infer``) is compiled once per config; the
host side only molds inputs (resize + mean-subtract) and unmolds outputs
(box rescale + mask paste), exactly mirroring the reference's host steps.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .models.sln import SLNAmodal
from .utils import image as image_utils


class Detector:
    """Runs the detection pipeline on raw images.

    Usage::

        det = Detector(config, params)
        results = det.detect([image])          # list of dicts, like reference
    """

    def __init__(self, config: Config, variables: Dict[str, Any]):
        self.config = config
        self.variables = variables
        self.model = SLNAmodal(config)
        self._infer = jax.jit(
            lambda v, images, windows: self.model.apply(v, images, windows)
        )

    def detect(self, images: List[np.ndarray]) -> List[Dict[str, np.ndarray]]:
        """images: list of [H, W, 3] uint8 arrays (any sizes).

        Returns, per image: dict(rois [N,4] px, class_ids [N], scores [N],
        masks [H, W, N]) — the reference's output contract.
        """
        cfg = self.config
        molded, metas, windows = image_utils.mold_inputs(images, cfg)
        out = self._infer(
            self.variables,
            jnp.asarray(molded),
            jnp.asarray(windows, jnp.float32),
        )
        detections = np.asarray(out.detections)
        masks = np.asarray(out.masks)  # [B, D, mh, mw, C]

        results = []
        for i, image in enumerate(images):
            rois, class_ids, scores, full_masks = image_utils.unmold_detections(
                detections[i], masks[i], image.shape, windows[i]
            )
            results.append(
                {
                    "rois": rois,
                    "class_ids": class_ids,
                    "scores": scores,
                    "masks": full_masks,
                }
            )
        return results
