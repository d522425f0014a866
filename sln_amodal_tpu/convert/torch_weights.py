"""Convert reference torch checkpoints → sln_amodal_tpu flax params.

Handles the reference's released checkpoints (``COCOA.pth`` / ``D2SA.pth`` —
the post-surgery MaskRCNN state_dict, ``/root/reference/amodal_train.py:606-614``),
the Mask R-CNN COCO init (``mask_rcnn_coco.pth``) and the GLM weights
(``deeplabv2.pth``).

Tensor layout rules:
- Conv2d weight  OIHW → HWIO  (transpose 2,3,1,0)
- Linear weight  [out, in] → [in, out]
- ConvTranspose2d weight [in, out, kh, kw] → flax ConvTranspose kernel
  [kh, kw, in, out] — validated numerically in tests/test_convert.py
- BatchNorm (weight, bias, running_mean, running_var) →
  FrozenBatchNorm (scale, bias, mean, var)

Input is a ``{name: np.ndarray}`` dict — use :func:`load_torch_state_dict`
to read a ``.pth`` with torch (CPU), or feed arrays directly in tests.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Array]


def load_torch_state_dict(path: str) -> Dict[str, Array]:
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def _conv(sd: StateDict, name: str, bias: bool = True) -> Dict[str, Array]:
    out = {"kernel": np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))}
    if bias and f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _deconv(sd: StateDict, name: str) -> Dict[str, Array]:
    # torch ConvTranspose2d weight [in, out, kh, kw] → flax ConvTranspose
    # (transpose_kernel=False) kernel [kh, kw, in, out] with spatial flip;
    # parity verified exactly in tests/test_convert.py.
    w = sd[f"{name}.weight"]
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _linear(sd: StateDict, name: str) -> Dict[str, Array]:
    return {"kernel": sd[f"{name}.weight"].T, "bias": sd[f"{name}.bias"]}


def _bn(sd: StateDict, name: str) -> Dict[str, Array]:
    return {
        "scale": sd[f"{name}.weight"],
        "bias": sd[f"{name}.bias"],
        "mean": sd[f"{name}.running_mean"],
        "var": sd[f"{name}.running_var"],
    }


# --------------------------------------------------------------- backbone ---

RESNET_BLOCK_COUNTS = {"resnet101": (3, 4, 23, 3), "resnet50": (3, 4, 6, 3)}


def convert_resnet_fpn(sd: StateDict, architecture: str = "resnet101") -> Dict:
    """Reference ``fpn.*`` keys → ResNetFPN param tree."""
    p: Dict = {}
    p["stem_conv"] = _conv(sd, "fpn.C1.0")
    p["stem_frozen_bn"] = _bn(sd, "fpn.C1.1")

    blocks = RESNET_BLOCK_COUNTS[architecture]
    for stage_idx, n_blocks in enumerate(blocks):
        cname = f"fpn.C{stage_idx + 2}"       # torch: C2..C5
        lname = f"layer{stage_idx + 2}"       # ours: layer2..layer5
        stage: Dict = {}
        for b in range(n_blocks):
            blk: Dict = {}
            for i in (1, 2, 3):
                blk[f"conv{i}"] = _conv(sd, f"{cname}.{b}.conv{i}")
                blk[f"frozen_bn{i}"] = _bn(sd, f"{cname}.{b}.bn{i}")
            if f"{cname}.{b}.downsample.0.weight" in sd:
                blk["downsample_conv"] = _conv(sd, f"{cname}.{b}.downsample.0")
                blk["downsample_frozen_bn"] = _bn(sd, f"{cname}.{b}.downsample.1")
            stage[f"block{b}"] = blk
        p[lname] = stage

    for lvl in (2, 3, 4, 5):
        p[f"p{lvl}_lateral"] = _conv(sd, f"fpn.P{lvl}_conv1")
        p[f"p{lvl}_smooth"] = _conv(sd, f"fpn.P{lvl}_conv2.1")
    return p


# ------------------------------------------------------------------ heads ---

def convert_rpn(sd: StateDict) -> Dict:
    return {
        "conv_shared": _conv(sd, "rpn.conv_shared"),
        "conv_class": _conv(sd, "rpn.conv_class"),
        "conv_bbox": _conv(sd, "rpn.conv_bbox"),
    }


def convert_classifier(sd: StateDict) -> Dict:
    return {
        "conv1": _conv(sd, "classifier.conv1"),
        "frozen_bn1": _bn(sd, "classifier.bn1"),
        "conv2": _conv(sd, "classifier.conv2"),
        "frozen_bn2": _bn(sd, "classifier.bn2"),
        "linear_class": _linear(sd, "classifier.linear_class"),
        "linear_bbox": _linear(sd, "classifier.linear_bbox"),
    }


def convert_mask_head(sd: StateDict) -> Dict:
    p: Dict = {}
    for i in range(1, 5):
        p[f"conv{i}"] = _conv(sd, f"mask.conv{i}")
        p[f"frozen_bn{i}"] = _bn(sd, f"mask.bn{i}")
    p["deconv"] = _deconv(sd, "mask.deconv")
    p["conv5"] = _conv(sd, "mask.conv5")
    return p


# -------------------------------------------------------------------- GLM ---

def convert_deeplab(sd: StateDict, prefix: str = "GLM_modual.") -> Dict:
    """DeepLabV2-MSC weights (keys ``base.layer*.*``) → DeepLabV2MSC tree.

    ``prefix`` is "GLM_modual." when reading a full-model checkpoint and ""
    when reading a standalone deeplabv2.pth.
    """

    def cbn(name: str) -> Dict:
        return {
            "conv": _conv(sd, f"{prefix}{name}.conv", bias=False),
            "frozen_bn": _bn(sd, f"{prefix}{name}.bn"),
        }

    base: Dict = {"stem": cbn("base.layer1.conv1")}
    n_blocks = (3, 4, 23, 3)
    for li, n in enumerate(n_blocks):
        lname = f"layer{li + 2}"
        layer: Dict = {}
        for b in range(1, n + 1):
            tb = f"base.{lname}.block{b}"
            blk = {
                "reduce": cbn(f"{tb}.reduce"),
                "conv3x3": cbn(f"{tb}.conv3x3"),
                "increase": cbn(f"{tb}.increase"),
            }
            if f"{prefix}{tb}.shortcut.conv.weight" in sd:
                blk["shortcut"] = cbn(f"{tb}.shortcut")
            layer[f"block{b}"] = blk
        base[lname] = layer

    aspp = {f"c{i}": _conv(sd, f"{prefix}base.aspp.c{i}") for i in range(4)}
    base["aspp"] = aspp
    return {"base": base}


# ------------------------------------------------------------- full model ---

def convert_full_checkpoint(sd: StateDict, architecture: str = "resnet101") -> Dict:
    """Post-surgery reference checkpoint → SLNAmodal {'params': ...} tree."""
    params = {
        "fpn": convert_resnet_fpn(sd, architecture),
        "rpn": convert_rpn(sd),
        "classifier": convert_classifier(sd),
        "mask": convert_mask_head(sd),
    }
    if any(k.startswith("GLM_modual.") for k in sd):
        params["glm"] = convert_deeplab(sd, "GLM_modual.")
    return {"params": params}


# The four modules the reference re-creates AFTER loading mask_rcnn_coco.pth
# (``/root/reference/amodal_train.py:606-610``): mask.conv1 (439-in),
# mask.conv5 (2-class), classifier.linear_class / linear_bbox (2-class).
_SURGICAL_PATHS = (
    ("classifier", "linear_class"),
    ("classifier", "linear_bbox"),
    ("mask", "conv1"),
    ("mask", "conv5"),
)


def is_pre_surgery(sd: StateDict, template: Mapping) -> bool:
    """True when ``sd`` is the 81-class ``mask_rcnn_coco.pth`` layout — the
    reference's training bootstrap — rather than a post-surgery COCOA.pth /
    D2SA.pth. Detected by the classifier-head width: the COCO init carries
    ``classifier.linear_class`` of [81, 1024] where the amodal model's is
    [num_classes=2, 1024] (``/root/reference/amodal_train.py:53,605``)."""
    lc = sd.get("classifier.linear_class.weight")
    if lc is None:
        return False
    tmpl_lc = template["params"]["classifier"]["linear_class"]["kernel"]
    return int(lc.shape[0]) != int(tmpl_lc.shape[1])


def convert_coco_init(sd: StateDict, template: Mapping,
                      architecture: str = "resnet101") -> Dict:
    """81-class ``mask_rcnn_coco.pth`` → SLNAmodal tree with the reference's
    head surgery applied (``/root/reference/amodal_train.py:601-610``):
    backbone/FPN/RPN, classifier convs+BNs, mask conv2-4+BNs+deconv and —
    like torch module surgery, which replaces conv modules but leaves the
    following BatchNorms — mask.bn1-4 come from the checkpoint; the four
    surgical layers (mask.conv1 439-in, mask.conv5, both classifier linears
    at the amodal num_classes) are taken fresh from ``template``'s init.

    The COCO init has no GLM weights; the caller attaches deeplabv2.pth
    (``amodal_train.py:612-613``) or keeps the template's.
    """
    params = {
        "fpn": convert_resnet_fpn(sd, architecture),
        "rpn": convert_rpn(sd),
        "classifier": convert_classifier(sd),
        "mask": convert_mask_head(sd),
    }
    tpl = template["params"]
    for path in _SURGICAL_PATHS:
        node, tnode = params, tpl
        for k in path[:-1]:
            node, tnode = node[k], tnode[k]
        node[path[-1]] = {k: np.asarray(v) for k, v in tnode[path[-1]].items()}
    return {"params": params}


def load_reference_checkpoint(path: str, glm_path: str | None = None,
                              template: Mapping | None = None) -> Dict:
    """Load a reference torch checkpoint into flax params.

    Post-surgery COCOA.pth / D2SA.pth convert key-for-key; the pre-surgery
    81-class ``mask_rcnn_coco.pth`` (detected via :func:`is_pre_surgery`,
    requires ``template`` for the fresh surgical layers) goes through
    :func:`convert_coco_init`. Either way a missing GLM is filled from
    ``glm_path`` (deeplabv2.pth) when given, else from ``template``.
    """
    sd = load_torch_state_dict(path)
    if template is not None and is_pre_surgery(sd, template):
        tree = convert_coco_init(sd, template)
    else:
        tree = convert_full_checkpoint(sd)
    if "glm" not in tree["params"]:
        if glm_path is not None:
            glm_sd = load_torch_state_dict(glm_path)
            tree["params"]["glm"] = convert_deeplab(glm_sd, prefix="")
        elif template is not None:
            # reference training requires deeplabv2.pth (amodal_train.py:612);
            # fall back to the init so experiments without it still run —
            # but loudly: random GLM priors make full-parity eval numbers
            # meaningless
            import sys
            print(
                f"WARNING: {path} has no GLM weights and no glm_path was "
                "given (deeplabv2.pth not found?) — using RANDOM-INIT GLM. "
                "Detection masks will not match the reference checkpoints.",
                file=sys.stderr,
            )
            tree["params"]["glm"] = template["params"]["glm"]
        else:
            raise ValueError("checkpoint lacks GLM weights; pass glm_path")
    return tree


def assert_tree_matches(converted, initialized) -> None:
    """Verify a converted tree has exactly the shapes of an init tree."""
    import jax

    conv_flat = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    init_flat = dict(jax.tree_util.tree_flatten_with_path(initialized)[0])
    missing = set(init_flat) - set(conv_flat)
    extra = set(conv_flat) - set(init_flat)
    if missing or extra:
        # KeyPath entries aren't orderable — sort their string forms
        miss = sorted(jax.tree_util.keystr(k) for k in missing)[:5]
        ext = sorted(jax.tree_util.keystr(k) for k in extra)[:5]
        raise ValueError(f"param tree mismatch: missing={miss} extra={ext}")
    for k, v in init_flat.items():
        if tuple(conv_flat[k].shape) != tuple(v.shape):
            raise ValueError(f"shape mismatch at {k}: {conv_flat[k].shape} vs {v.shape}")
