"""Export sln_amodal_tpu params → reference torch ``state_dict`` layout.

The exact inverse of :mod:`torch_weights`: a tree trained here round-trips
into a ``.pth`` the reference's ``MaskRCNN.load_weights`` (``strict=False``,
``/root/reference/model.py:287-295``) accepts — so a user can take weights
back to the PyTorch stack (or diff them tensor-by-tensor against the
released checkpoints). Layout rules are the converter's, inverted:

- flax Conv kernel  HWIO → Conv2d OIHW
- flax Dense kernel [in, out] → Linear [out, in]
- flax ConvTranspose kernel [kh, kw, in, out] (spatially flipped) →
  ConvTranspose2d [in, out, kh, kw]
- FrozenBatchNorm (scale, bias, mean, var) → BN (weight, bias,
  running_mean, running_var)

Round-trip bit-exactness (convert → export == identity on the reference
key set) is pinned by ``tests/test_torch_export.py``.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from .torch_weights import RESNET_BLOCK_COUNTS

Array = np.ndarray


def _np(x) -> Array:
    return np.asarray(x, dtype=np.float32)


def _conv(out: Dict[str, Array], tree: Mapping, name: str) -> None:
    out[f"{name}.weight"] = np.transpose(_np(tree["kernel"]), (3, 2, 0, 1))
    if "bias" in tree:
        out[f"{name}.bias"] = _np(tree["bias"])


def _deconv(out: Dict[str, Array], tree: Mapping, name: str) -> None:
    k = _np(tree["kernel"])[::-1, ::-1]  # undo the spatial flip
    out[f"{name}.weight"] = np.ascontiguousarray(np.transpose(k, (2, 3, 0, 1)))
    if "bias" in tree:
        out[f"{name}.bias"] = _np(tree["bias"])


def _linear(out: Dict[str, Array], tree: Mapping, name: str) -> None:
    out[f"{name}.weight"] = np.ascontiguousarray(_np(tree["kernel"]).T)
    out[f"{name}.bias"] = _np(tree["bias"])


def _bn(out: Dict[str, Array], tree: Mapping, name: str) -> None:
    out[f"{name}.weight"] = _np(tree["scale"])
    out[f"{name}.bias"] = _np(tree["bias"])
    out[f"{name}.running_mean"] = _np(tree["mean"])
    out[f"{name}.running_var"] = _np(tree["var"])


def export_state_dict(variables: Mapping,
                      architecture: str = "resnet101",
                      include_glm: bool = True) -> Dict[str, Array]:
    """``{'params': ...}`` tree → flat reference-named state dict."""
    p = variables["params"]
    sd: Dict[str, Array] = {}

    # backbone + FPN neck (torch names fpn.C*/fpn.P*, modals.py:159-257)
    fpn = p["fpn"]
    _conv(sd, fpn["stem_conv"], "fpn.C1.0")
    _bn(sd, fpn["stem_frozen_bn"], "fpn.C1.1")
    for stage_idx, n_blocks in enumerate(RESNET_BLOCK_COUNTS[architecture]):
        cname, lname = f"fpn.C{stage_idx + 2}", f"layer{stage_idx + 2}"
        for b in range(n_blocks):
            blk = fpn[lname][f"block{b}"]
            for i in (1, 2, 3):
                _conv(sd, blk[f"conv{i}"], f"{cname}.{b}.conv{i}")
                _bn(sd, blk[f"frozen_bn{i}"], f"{cname}.{b}.bn{i}")
            if "downsample_conv" in blk:
                _conv(sd, blk["downsample_conv"], f"{cname}.{b}.downsample.0")
                _bn(sd, blk["downsample_frozen_bn"], f"{cname}.{b}.downsample.1")
    for lvl in (2, 3, 4, 5):
        _conv(sd, fpn[f"p{lvl}_lateral"], f"fpn.P{lvl}_conv1")
        _conv(sd, fpn[f"p{lvl}_smooth"], f"fpn.P{lvl}_conv2.1")

    for key in ("conv_shared", "conv_class", "conv_bbox"):
        _conv(sd, p["rpn"][key], f"rpn.{key}")

    cls = p["classifier"]
    _conv(sd, cls["conv1"], "classifier.conv1")
    _bn(sd, cls["frozen_bn1"], "classifier.bn1")
    _conv(sd, cls["conv2"], "classifier.conv2")
    _bn(sd, cls["frozen_bn2"], "classifier.bn2")
    _linear(sd, cls["linear_class"], "classifier.linear_class")
    _linear(sd, cls["linear_bbox"], "classifier.linear_bbox")

    mask = p["mask"]
    for i in range(1, 5):
        _conv(sd, mask[f"conv{i}"], f"mask.conv{i}")
        _bn(sd, mask[f"frozen_bn{i}"], f"mask.bn{i}")
    _deconv(sd, mask["deconv"], "mask.deconv")
    _conv(sd, mask["conv5"], "mask.conv5")

    if include_glm and "glm" in p:
        _export_deeplab(sd, p["glm"], prefix="GLM_modual.")
    return sd


def _export_deeplab(sd: Dict[str, Array], glm: Mapping,
                    prefix: str = "GLM_modual.") -> None:
    base = glm["base"]

    def cbn(tree: Mapping, name: str) -> None:
        _conv(sd, tree["conv"], f"{prefix}{name}.conv")
        _bn(sd, tree["frozen_bn"], f"{prefix}{name}.bn")

    cbn(base["stem"], "base.layer1.conv1")
    for li, n in enumerate((3, 4, 23, 3)):
        lname = f"layer{li + 2}"
        for b in range(1, n + 1):
            blk = base[lname][f"block{b}"]
            tb = f"base.{lname}.block{b}"
            cbn(blk["reduce"], f"{tb}.reduce")
            cbn(blk["conv3x3"], f"{tb}.conv3x3")
            cbn(blk["increase"], f"{tb}.increase")
            if "shortcut" in blk:
                cbn(blk["shortcut"], f"{tb}.shortcut")
    for i in range(4):
        _conv(sd, base["aspp"][f"c{i}"], f"{prefix}base.aspp.c{i}")


def export_deeplab_state_dict(variables: Mapping) -> Dict[str, Array]:
    """GLM subtree → standalone ``deeplabv2.pth``-layout dict (no prefix)."""
    sd: Dict[str, Array] = {}
    _export_deeplab(sd, variables["params"]["glm"], prefix="")
    return sd


def save_torch_checkpoint(variables: Mapping, path: str,
                          architecture: str = "resnet101",
                          include_glm: bool = True) -> str:
    """Write a reference-loadable ``.pth`` (torch CPU tensors)."""
    import torch

    sd = export_state_dict(variables, architecture, include_glm)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)
    return path


def main(argv=None) -> None:
    """CLI: ``python -m sln_amodal_tpu.convert.torch_export CKPT OUT.pth``.

    CKPT is a native ``.ckpt`` (or a ``.pth``, for layout normalization).
    """
    import argparse

    import jax

    from ..config import inference_config
    from ..models.sln import init_params
    from ..train import checkpoint as ckpt
    from ..utils.runtime import setup_runtime

    p = argparse.ArgumentParser(
        description="Export weights to the reference torch .pth layout.")
    p.add_argument("ckpt", help="native .ckpt (or .pth) to export")
    p.add_argument("out", help="output .pth path")
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--no_glm", action="store_true",
                   help="omit GLM_modual.* keys (export the Mask R-CNN only)")
    args = p.parse_args(argv)

    setup_runtime(platform="cpu")  # export is host-only; keep off the TPU
    # param shapes are image-size independent (all conv/linear), so the
    # restore template can init at a small size — seconds, not minutes
    cfg = inference_config(image_size=128, glm_input_size=65,
                           num_classes=args.num_classes)
    template = init_params(cfg, jax.random.PRNGKey(0))
    variables = ckpt.load_weights(args.ckpt, template)
    out = save_torch_checkpoint(variables, args.out,
                                include_glm=not args.no_glm)
    n = len(export_state_dict(variables, include_glm=not args.no_glm))
    print(f"wrote {out} ({n} tensors, reference layout)")


if __name__ == "__main__":
    main()
