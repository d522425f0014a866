"""Host-side image molding / unmolding (numpy + PIL).

Replicates the reference's preprocessing and postprocessing numerics:

- images are squash-resized to ``image_size`` squared with PIL bilinear —
  the reference's ``scipy.misc.imresize`` is PIL under the hood
  (``/root/reference/utils.py:351-356``);
- ``mold_image`` subtracts the RGB mean pixel (Functions.py:658-663);
- ``unmold_mask`` reproduces the ``scipy.misc.imresize`` float path
  exactly: **bytescale by data min/max to uint8**, PIL bilinear resize,
  /255, threshold 0.5 (``/root/reference/utils.py:447-465``) — note the
  min/max rescale makes the 0.5 threshold *relative* to the mask's range,
  a quirk that affects mask parity;
- ``unmold_detections`` trims the zero-padded detections, maps boxes back
  to the original image frame and pastes full-frame masks
  (``/root/reference/model.py:747-806``).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
from PIL import Image


def pil_resize_uint8(arr: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize of a uint8 array (H, W[, C]) via PIL."""
    if arr.shape[:2] == tuple(size_hw):
        # PIL bilinear at scale 1 is an exact identity (verified by
        # test_image_utils) but still costs ~50 ms on a 1024² frame
        return arr
    img = Image.fromarray(arr)
    img = img.resize((size_hw[1], size_hw[0]), Image.BILINEAR)
    return np.asarray(img)


def bytescale(data: np.ndarray) -> np.ndarray:
    """scipy.misc.bytescale semantics: min/max → [0, 255] uint8 with +0.5
    rounding."""
    cmin = float(data.min()) if data.size else 0.0
    cmax = float(data.max()) if data.size else 1.0
    cscale = cmax - cmin
    if cscale == 0:
        cscale = 1.0
    scale = 255.0 / cscale
    bytedata = (data - cmin) * scale
    return (np.clip(bytedata, 0, 255) + 0.5).astype(np.uint8)


def imresize_float(arr: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    """scipy.misc.imresize on a float array: bytescale → PIL bilinear →
    uint8 result (caller divides by 255)."""
    return pil_resize_uint8(bytescale(arr), size_hw)


def resize_image(image: np.ndarray, image_size: int):
    """Squash-resize to (image_size, image_size); returns
    (resized, window, scale, padding) with the reference's conventions."""
    h, w = image.shape[:2]
    resized = pil_resize_uint8(image.astype(np.uint8), (image_size, image_size))
    window = (0, 0, image_size, image_size)
    scale = (image_size / h, image_size / w)
    padding = [(0, 0), (0, 0), (0, 0)]
    return resized, window, scale, padding


def resize_layer_masks(masks: np.ndarray, scale) -> np.ndarray:
    """Nearest-neighbour zoom of [H, W, L, N] layer masks (utils.py:358-362)."""
    import scipy.ndimage

    return scipy.ndimage.zoom(masks, zoom=[scale[0], scale[1], 1, 1], order=0)


def mold_image(image: np.ndarray, mean_pixel) -> np.ndarray:
    return image.astype(np.float32) - np.asarray(mean_pixel, np.float32)


def unmold_image(molded: np.ndarray, mean_pixel) -> np.ndarray:
    return (molded + np.asarray(mean_pixel, np.float32)).astype(np.uint8)


def compose_image_meta(image_id, image_shape, window, active_class_ids):
    """[id, shape(3), window(4), active_class_ids(...)] flat meta array.

    Reference contract helper (``model.py:709-727`` threads these through
    its graph); this pipeline passes windows directly, so metas are only
    built by callers that want the reference's array format."""
    return np.array(
        [image_id] + list(image_shape) + list(window) + list(active_class_ids)
    )


def parse_image_meta(meta: np.ndarray):
    return meta[:, 0], meta[:, 1:4], meta[:, 4:8], meta[:, 8:]


def mold_inputs(images: List[np.ndarray], config):
    """List of raw images → (resized [N,S,S,3] uint8, windows [N,4]).

    The mean-pixel subtraction (``mold_image``) happens ON DEVICE inside
    the jitted inference program: ``uint8 → f32`` is exact, so the result
    is bit-identical while the host→device transfer is 4× smaller (uint8
    instead of f32 — 100 MB/batch-8 at 1024², measured ~1 s over a
    ~100 MB/s link)."""
    molded, windows = [], []
    for image in images:
        resized, window, _, _ = resize_image(image, config.image_size)
        molded.append(resized)
        windows.append(window)
    return np.stack(molded), np.stack(windows)


def unmold_mask(mask: np.ndarray, bbox, image_shape) -> np.ndarray:
    """Paste one low-res mask into the full frame (utils.py:447-465)."""
    y1, x1, y2, x2 = [int(v) for v in bbox]
    full = np.zeros(image_shape[:2], dtype=np.uint8)
    full[y1:y2, x1:x2] = unmold_crop(mask, bbox)
    return full


def unmold_crop(mask: np.ndarray, bbox) -> np.ndarray:
    """One low-res mask → thresholded binary uint8 crop at box size
    (the resize+threshold half of ``unmold_mask``, utils.py:447-465)."""
    y1, x1, y2, x2 = [int(v) for v in bbox]
    mask = np.squeeze(mask)
    resized = imresize_float(mask, (y2 - y1, x2 - x1)).astype(np.float32) / 255.0
    return np.where(resized >= 0.5, 1, 0).astype(np.uint8)


def unmold_detections_parts(detections: np.ndarray, mrcnn_mask: np.ndarray,
                            image_shape, window):
    """Shared unmold math → (boxes px i32 [N,4], class_ids, scores, binary
    box-crop list). The crops are the full information content of the
    detection masks — the full [H,W] frames are just these pasted into
    zeros, so RLE encoding can work straight off the crops (O(box area)
    per mask instead of O(frame area))."""
    zero_ix = np.where(detections[:, 4] == 0)[0]
    n = zero_ix[0] if zero_ix.shape[0] > 0 else detections.shape[0]

    boxes = detections[:n, :4]
    class_ids = detections[:n, 4].astype(np.int32)
    class_ids[class_ids > 0] = 1  # single foreground class (model.py:770)
    scores = detections[:n, 5]
    masks = mrcnn_mask[np.arange(n), :, :, class_ids]

    h_scale = image_shape[0] / (window[2] - window[0])
    w_scale = image_shape[1] / (window[3] - window[1])
    scales = np.array([h_scale, w_scale, h_scale, w_scale])
    shifts = np.array([window[0], window[1], window[0], window[1]])
    boxes = np.multiply(boxes - shifts, scales).astype(np.int32)

    exclude = np.where((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]) <= 0)[0]
    if exclude.shape[0] > 0:
        boxes = np.delete(boxes, exclude, axis=0)
        class_ids = np.delete(class_ids, exclude, axis=0)
        scores = np.delete(scores, exclude, axis=0)
        masks = np.delete(masks, exclude, axis=0)
        n = class_ids.shape[0]

    crops = [unmold_crop(masks[i], boxes[i]) for i in range(n)]
    return boxes, class_ids, scores, crops


def unmold_detections(detections: np.ndarray, mrcnn_mask: np.ndarray, image_shape, window):
    """Network outputs → (boxes px, class_ids, scores, full masks [H,W,N]).

    detections: [D, 6] zero-padded; mrcnn_mask: [D, mh, mw, C] (NHWC).

    The [H,W,N] result is a transposed view of a C-contiguous [N,H,W]
    buffer: per-mask slices ``full_masks[:, :, i]`` stay contiguous, and
    the interleaved ``np.stack(axis=-1)`` this replaces cost 1.7 s/image
    at 100 detections (byte-strided writes across a 100 MB array).
    """
    boxes, class_ids, scores, crops = unmold_detections_parts(
        detections, mrcnn_mask, image_shape, window)
    n = len(crops)
    if n == 0:
        return boxes, class_ids, scores, np.empty(image_shape[:2] + (0,))
    full = np.zeros((n,) + tuple(image_shape[:2]), np.uint8)
    for i, crop in enumerate(crops):
        y1, x1, y2, x2 = boxes[i]
        full[i, y1:y2, x1:x2] = crop
    return boxes, class_ids, scores, full.transpose(1, 2, 0)
