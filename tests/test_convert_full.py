"""Full-checkpoint converter test.

Synthesizes a state_dict with the reference's exact key naming and tensor
layouts (post-surgery MaskRCNN + GLM_modual — structure documented in
SURVEY.md §2 from modals.py / deeplabv2.py / amodal_train.py:606-614),
converts it, and checks the resulting tree matches SLNAmodal's init tree
key-for-key and shape-for-shape. This is the gate that real COCOA.pth /
D2SA.pth checkpoints will load correctly.
"""

import numpy as np
import pytest

import jax

from sln_amodal_tpu.config import Config
from sln_amodal_tpu.convert.torch_weights import (
    assert_tree_matches,
    convert_full_checkpoint,
)
from sln_amodal_tpu.models.sln import init_params


def conv(sd, name, cin, cout, k):
    sd[f"{name}.weight"] = np.zeros((cout, cin, k, k), np.float32)
    sd[f"{name}.bias"] = np.zeros((cout,), np.float32)


def conv_nobias(sd, name, cin, cout, k):
    sd[f"{name}.weight"] = np.zeros((cout, cin, k, k), np.float32)


def bn(sd, name, c):
    for suffix in ("weight", "bias", "running_mean", "running_var"):
        sd[f"{name}.{suffix}"] = np.zeros((c,), np.float32)


def linear(sd, name, cin, cout):
    sd[f"{name}.weight"] = np.zeros((cout, cin), np.float32)
    sd[f"{name}.bias"] = np.zeros((cout,), np.float32)


def build_reference_state_dict(num_classes=2):
    sd = {}
    # --- ResNet-101 backbone under fpn.C*
    conv(sd, "fpn.C1.0", 3, 64, 7)
    bn(sd, "fpn.C1.1", 64)
    blocks = {"C2": (3, 64, 64), "C3": (4, 256, 128), "C4": (23, 512, 256),
              "C5": (3, 1024, 512)}
    for cname, (n, cin0, planes) in blocks.items():
        for b in range(n):
            cin = cin0 if b == 0 else planes * 4
            pre = f"fpn.{cname}.{b}"
            conv(sd, f"{pre}.conv1", cin, planes, 1)
            bn(sd, f"{pre}.bn1", planes)
            conv(sd, f"{pre}.conv2", planes, planes, 3)
            bn(sd, f"{pre}.bn2", planes)
            conv(sd, f"{pre}.conv3", planes, planes * 4, 1)
            bn(sd, f"{pre}.bn3", planes * 4)
            if b == 0:
                conv(sd, f"{pre}.downsample.0", cin, planes * 4, 1)
                bn(sd, f"{pre}.downsample.1", planes * 4)
    # --- FPN neck
    for lvl, cin in ((2, 256), (3, 512), (4, 1024), (5, 2048)):
        conv(sd, f"fpn.P{lvl}_conv1", cin, 256, 1)
        conv(sd, f"fpn.P{lvl}_conv2.1", 256, 256, 3)
    # --- RPN
    conv(sd, "rpn.conv_shared", 256, 512, 3)
    conv(sd, "rpn.conv_class", 512, 6, 1)
    conv(sd, "rpn.conv_bbox", 512, 12, 1)
    # --- classifier (post-surgery 2-class linears)
    conv(sd, "classifier.conv1", 256, 1024, 7)
    bn(sd, "classifier.bn1", 1024)
    conv(sd, "classifier.conv2", 1024, 1024, 1)
    bn(sd, "classifier.bn2", 1024)
    linear(sd, "classifier.linear_class", 1024, num_classes)
    linear(sd, "classifier.linear_bbox", 1024, num_classes * 4)
    # --- mask head (post-surgery: conv1 439ch in, conv5 num_classes out)
    conv(sd, "mask.conv1", 439, 256, 3)
    bn(sd, "mask.bn1", 256)
    for i in (2, 3, 4):
        conv(sd, f"mask.conv{i}", 256, 256, 3)
        bn(sd, f"mask.bn{i}", 256)
    sd["mask.deconv.weight"] = np.zeros((256, 256, 2, 2), np.float32)
    sd["mask.deconv.bias"] = np.zeros((256,), np.float32)
    conv(sd, "mask.conv5", 256, num_classes, 1)
    # --- GLM (DeepLabV2-ResNet101-MSC, 182 classes)
    def cbn(name, cin, cout, k):
        conv_nobias(sd, f"{name}.conv", cin, cout, k)
        bn(sd, f"{name}.bn", cout)

    g = "GLM_modual.base"
    cbn(f"{g}.layer1.conv1", 3, 64, 7)
    glayers = {"layer2": (3, 64, 256), "layer3": (4, 256, 512),
               "layer4": (23, 512, 1024), "layer5": (3, 1024, 2048)}
    for lname, (n, cin0, cout) in glayers.items():
        mid = cout // 4
        for b in range(1, n + 1):
            cin = cin0 if b == 1 else cout
            pre = f"{g}.{lname}.block{b}"
            cbn(f"{pre}.reduce", cin, mid, 1)
            cbn(f"{pre}.conv3x3", mid, mid, 3)
            cbn(f"{pre}.increase", mid, cout, 1)
            if b == 1:
                cbn(f"{pre}.shortcut", cin, cout, 1)
    for i in range(4):
        conv(sd, f"{g}.aspp.c{i}", 2048, 182, 3)
    return sd


@pytest.mark.slow
def test_full_checkpoint_converts_to_init_tree():
    sd = build_reference_state_dict()
    tree = convert_full_checkpoint(sd)
    cfg = Config(image_size=128, glm_input_size=65, compute_dtype="float32")
    init_tree = init_params(cfg, jax.random.PRNGKey(0))
    assert_tree_matches(tree, init_tree)


def test_missing_key_raises():
    sd = build_reference_state_dict()
    del sd["mask.conv3.weight"]
    with pytest.raises(KeyError):
        convert_full_checkpoint(sd)
