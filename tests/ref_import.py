"""Import the reference's REAL torch modules (/root/reference) read-only.

The round-3 full-graph parity test compares our jitted graph against a
hand-built torch replica of ``model.py:516-620`` — strong, but a
transcription error in the replica would be invisible. This helper imports
the reference's own ``model.py`` / ``modal/modals.py`` / ``modal/
deeplabv2.py`` under the installed torch so tests can run parity against
the REAL network (VERDICT round 3, next-round item 4).

Era shims (none touch the reference tree):

- ``nms.nms_wrapper.nms`` — the compiled CUDA/C extension is absent; the
  shim reproduces the exact ``cpu_nms`` semantics (greedy over descending
  scores, legacy +1 areas/IoU, suppress at ``> thresh``;
  ``/root/reference/nms/src/nms.c``) in numpy.
- ``roialign.roi_align.crop_and_resize.CropAndResizeFunction`` — the
  compiled extension is absent AND its old-style autograd.Function idiom
  (instance ``__init__`` + call) is rejected by modern torch; the shim is a
  plain class implementing the TF-legacy crop_and_resize forward
  (``crop_and_resize_kernel.cu:11-82`` semantics) vectorized in torch,
  NCHW in/out like the reference wrapper.
- ``skimage`` (+ ``measure``/``color``/``io``) — not installed; module-level
  imports only (the inference path never calls them), so the fakes raise
  on use.
- matplotlib is forced to the Agg backend (``Functions.py`` imports pyplot).

``torch.autograd.Variable`` / ``F.upsample`` / ``F.sigmoid`` still exist in
the installed torch and need no shims.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REF = "/root/reference"

_cache: dict = {}


def reference_available() -> bool:
    return os.path.isfile(os.path.join(REF, "model.py"))


# ------------------------------------------------------------------- shims --


def np_greedy_nms_plus_one(dets: np.ndarray, thresh: float) -> np.ndarray:
    """Exact ``cpu_nms`` (nms/src/nms.c): boxes [N, 5] = (y1, x1, y2, x2,
    score); greedy over descending scores, +1 areas/intersections,
    suppress at IoU > thresh. Returns kept indices in score order."""
    y1, x1, y2, x2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]
    scores = dets[:, 4]
    areas = (y2 - y1 + 1.0) * (x2 - x1 + 1.0)
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(dets.shape[0], bool)
    keep = []
    for idx in order:
        if suppressed[idx]:
            continue
        keep.append(idx)
        yy1 = np.maximum(y1[idx], y1)
        xx1 = np.maximum(x1[idx], x1)
        yy2 = np.minimum(y2[idx], y2)
        xx2 = np.minimum(x2[idx], x2)
        inter = np.maximum(yy2 - yy1 + 1.0, 0) * np.maximum(xx2 - xx1 + 1.0, 0)
        iou = inter / (areas[idx] + areas - inter)
        suppressed |= iou > thresh
        suppressed[idx] = False
    return np.asarray(keep, np.int64)


def torch_crop_and_resize(image, boxes, box_ind, crop_height, crop_width,
                          extrapolation_value=0.0):
    """TF-legacy crop_and_resize forward, vectorized in torch, NCHW in/out.

    Same spec as ``sln_amodal_tpu.ops.roi_align.crop_and_resize`` (proven
    against the per-pixel oracle in tests/test_ops.py): sample coords
    scaled by (dim - 1), f32 coordinate math, bilinear interpolation in the
    image dtype, ``extrapolation_value`` outside [0, dim-1]."""
    import torch

    _, _, h, w = image.shape
    ch, cw = int(crop_height), int(crop_width)
    bx = boxes.detach().to(torch.float32)
    y1, x1, y2, x2 = bx[:, 0], bx[:, 1], bx[:, 2], bx[:, 3]

    def coords(lo, hi, out_size, dim):
        dim1 = float(dim - 1)
        if out_size > 1:
            scale = (hi - lo) * dim1 / (out_size - 1)
            steps = torch.arange(out_size, dtype=torch.float32)
            return lo[:, None] * dim1 + steps[None, :] * scale[:, None]
        return (0.5 * (lo + hi) * dim1)[:, None]

    in_y = coords(y1, y2, ch, h)                                  # [N, ch]
    in_x = coords(x1, x2, cw, w)                                  # [N, cw]
    valid_y = (in_y >= 0) & (in_y <= h - 1)
    valid_x = (in_x >= 0) & (in_x <= w - 1)
    top = in_y.floor().clamp(0, h - 1).long()
    bottom = in_y.ceil().clamp(0, h - 1).long()
    y_lerp = (in_y - in_y.floor()).to(image.dtype)
    left = in_x.floor().clamp(0, w - 1).long()
    right = in_x.ceil().clamp(0, w - 1).long()
    x_lerp = (in_x - in_x.floor()).to(image.dtype)

    img = image[box_ind.long()]                                   # [N,C,H,W]
    n = img.shape[0]
    bi = torch.arange(n)[:, None, None]

    def gather(yy, xx):
        # advanced indices on dims (0, 2, 3) with a slice between → result
        # [N, ch, cw, C]
        return img[bi, :, yy[:, :, None], xx[:, None, :]]

    tl, tr = gather(top, left), gather(top, right)
    bl, br = gather(bottom, left), gather(bottom, right)
    xl = x_lerp[:, None, :, None]
    top_v = tl + (tr - tl) * xl
    bot_v = bl + (br - bl) * xl
    out = top_v + (bot_v - top_v) * y_lerp[:, :, None, None]

    valid = (valid_y[:, :, None, None] & valid_x[:, None, :, None])
    out = torch.where(valid, out, torch.as_tensor(
        extrapolation_value, dtype=image.dtype))
    return out.permute(0, 3, 1, 2).contiguous()                   # NCHW


def _install_shims() -> None:
    import torch

    os.environ.setdefault("MPLBACKEND", "Agg")

    if "nms" not in sys.modules or not hasattr(
            sys.modules.get("nms"), "nms_wrapper"):
        nms_pkg = types.ModuleType("nms")
        wrapper = types.ModuleType("nms.nms_wrapper")

        def nms(dets, thresh):
            keep = np_greedy_nms_plus_one(
                dets.detach().cpu().numpy().astype(np.float64), float(thresh))
            return torch.as_tensor(keep, dtype=torch.long)

        wrapper.nms = nms
        nms_pkg.nms_wrapper = wrapper
        sys.modules["nms"] = nms_pkg
        sys.modules["nms.nms_wrapper"] = wrapper

    if "roialign.roi_align.crop_and_resize" not in sys.modules:
        roialign = types.ModuleType("roialign")
        roi_align = types.ModuleType("roialign.roi_align")
        car = types.ModuleType("roialign.roi_align.crop_and_resize")

        class CropAndResizeFunction:
            def __init__(self, crop_height, crop_width,
                         extrapolation_value=0):
                self.crop_height = crop_height
                self.crop_width = crop_width
                self.extrapolation_value = extrapolation_value

            def __call__(self, image, boxes, box_ind):
                return torch_crop_and_resize(
                    image, boxes, box_ind, self.crop_height,
                    self.crop_width, self.extrapolation_value)

        car.CropAndResizeFunction = CropAndResizeFunction
        roi_align.crop_and_resize = car
        roialign.roi_align = roi_align
        sys.modules["roialign"] = roialign
        sys.modules["roialign.roi_align"] = roi_align
        sys.modules["roialign.roi_align.crop_and_resize"] = car

    if "skimage" not in sys.modules:
        def _unavailable(*_a, **_k):
            raise RuntimeError("skimage shim: not available in this env")

        sk = types.ModuleType("skimage")
        measure = types.ModuleType("skimage.measure")
        measure.label = _unavailable
        measure.regionprops = _unavailable
        color = types.ModuleType("skimage.color")
        color.gray2rgb = _unavailable
        color.rgb2gray = _unavailable
        io_mod = types.ModuleType("skimage.io")
        io_mod.imread = _unavailable
        io_mod.imsave = _unavailable
        morph = types.ModuleType("skimage.morphology")
        morph.disk = _unavailable
        morph.binary_dilation = _unavailable
        transform = types.ModuleType("skimage.transform")
        transform.resize = _unavailable
        sk.measure, sk.color, sk.io = measure, color, io_mod
        sk.morphology, sk.transform = morph, transform
        sys.modules["skimage"] = sk
        sys.modules["skimage.measure"] = measure
        sys.modules["skimage.color"] = color
        sys.modules["skimage.io"] = io_mod
        sys.modules["skimage.morphology"] = morph
        sys.modules["skimage.transform"] = transform


# ------------------------------------------------------------------ loader --


def load_reference_modules() -> dict:
    """Import and cache the reference's real modules. Returns a dict with
    ``model`` (module), ``modals``, ``Functions``, ``deeplabv2``,
    ``config`` (the reference Config class's module), ``utils``."""
    if _cache:
        return _cache
    _install_shims()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import config as ref_config      # noqa: PLC0415 — reference root module
    import model as ref_model        # noqa: PLC0415
    import utils as ref_utils        # noqa: PLC0415
    from modal import Functions, deeplabv2, modals  # noqa: PLC0415

    _cache.update(
        model=ref_model, modals=modals, Functions=Functions,
        deeplabv2=deeplabv2, config=ref_config, utils=ref_utils,
    )
    return _cache


def build_real_maskrcnn(image_size: int, workdir: str, num_classes: int = 2,
                        seed: int = 0, dtype=None):
    """Construct the reference's REAL MaskRCNN exactly per the live path
    (``amodal_train.py:574-614``): inference config, 81-class build, head
    surgery to ``num_classes``, GLM attach — then randomize every param and
    BN buffer (the released checkpoints don't exist in this environment).

    Returns (model, config). ``dtype=torch.float64`` doubles the module."""
    import torch
    import torch.nn as nn

    mods = load_reference_modules()

    class TestConfig(mods["config"].Config):
        NAME = "parity"
        GPU_COUNT = 0
        IMAGES_PER_GPU = 1
        NUM_CLASSES = 1 + 80          # pre-surgery, like Amodalfig
        IMAGE_MIN_DIM = image_size
        IMAGE_MAX_DIM = image_size
        DETECTION_MIN_CONFIDENCE = 0  # the eval path's InferenceConfig
        EXPERIMENT_DIR = os.path.join(workdir, "ref_logs")
        # keep the tiny-graph knobs in the reference's own config system
        POST_NMS_ROIS_INFERENCE = 50
        PRE_NMS_LIMIT = 200           # (informational; theirs hardcodes 6000)
        DETECTION_MAX_INSTANCES = 10

    config = TestConfig()
    model = mods["model"].MaskRCNN(config=config, model_dir=workdir)

    # the head surgery, verbatim semantics (amodal_train.py:606-614)
    config.NUM_CLASSES = num_classes
    model.mask.conv1 = nn.Conv2d(439, 256, kernel_size=3, stride=1)
    model.mask.conv5 = nn.Conv2d(256, config.NUM_CLASSES, kernel_size=1,
                                 stride=1)
    model.classifier.linear_class = nn.Linear(1024, config.NUM_CLASSES)
    model.classifier.linear_bbox = nn.Linear(1024, config.NUM_CLASSES * 4)
    model.current_epoch = 0
    model.GLM_modual = mods["deeplabv2"].DeepLabV2_ResNet101_MSC(182)

    rng = np.random.RandomState(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.from_numpy(
                (rng.randn(*p.shape) * 0.05).astype(np.float32)))
        for name, b in model.named_buffers():
            if name.endswith("running_var"):
                b.copy_(torch.from_numpy(
                    (0.5 + rng.rand(*b.shape)).astype(np.float32)))
            elif name.endswith("running_mean"):
                b.copy_(torch.from_numpy(
                    (rng.randn(*b.shape) * 0.05).astype(np.float32)))
    if dtype is not None:
        model = model.to(dtype)
    model.eval()
    return model, config
