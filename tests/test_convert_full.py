"""Full-checkpoint converter test.

Synthesizes a state_dict with the reference's exact key naming and tensor
layouts (post-surgery MaskRCNN + GLM_modual — structure documented in
SURVEY.md §2 from modals.py / deeplabv2.py / amodal_train.py:606-614),
converts it, and checks the resulting tree matches SLNAmodal's init tree
key-for-key and shape-for-shape. This is the gate that real COCOA.pth /
D2SA.pth checkpoints will load correctly.
"""

import argparse

import numpy as np
import pytest

import jax

from sln_amodal_tpu.config import Config
from sln_amodal_tpu.convert.torch_weights import (
    assert_tree_matches,
    convert_coco_init,
    convert_full_checkpoint,
    is_pre_surgery,
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


# --------------------------------------------- pre-surgery COCO bootstrap ---

def build_coco_init_state_dict():
    """The 81-class ``mask_rcnn_coco.pth`` layout: the reference loads it
    BEFORE head surgery (``amodal_train.py:601-610``), so mask.conv1 is the
    original FPN-only 256-in conv (modals.py:466) and there are no GLM keys.
    Distinctive values mark provenance of every group."""
    sd = build_reference_state_dict(num_classes=81)
    sd["mask.conv1.weight"] = np.zeros((256, 256, 3, 3), np.float32)
    sd["mask.conv1.bias"] = np.zeros((256,), np.float32)
    for k in [k for k in sd if k.startswith("GLM_modual.")]:
        del sd[k]
    sd["mask.conv2.weight"][:] = 2.0           # survives surgery
    sd["mask.bn1.weight"][:] = 3.0             # BN after replaced conv stays
    sd["classifier.conv1.weight"][:] = 4.0     # survives surgery
    sd["classifier.linear_class.weight"][:] = 9.9  # replaced by surgery
    return sd


def fake_template():
    """Hand-built template with just the shapes the surgery reads — avoids a
    full init_params (slow on this host) for the fast conversion test."""
    t = {
        "classifier": {
            "linear_class": {"kernel": np.full((1024, 2), 7.0, np.float32),
                             "bias": np.full((2,), 7.0, np.float32)},
            "linear_bbox": {"kernel": np.full((1024, 8), 7.0, np.float32),
                            "bias": np.full((8,), 7.0, np.float32)},
        },
        "mask": {
            "conv1": {"kernel": np.full((3, 3, 439, 256), 7.0, np.float32),
                      "bias": np.full((256,), 7.0, np.float32)},
            "conv5": {"kernel": np.full((1, 1, 256, 2), 7.0, np.float32),
                      "bias": np.full((2,), 7.0, np.float32)},
        },
        "glm": {"sentinel": np.zeros((1,), np.float32)},
    }
    return {"params": t}


def test_pre_surgery_detection():
    tmpl = fake_template()
    assert is_pre_surgery(build_coco_init_state_dict(), tmpl)
    assert not is_pre_surgery(build_reference_state_dict(), tmpl)


def test_coco_init_surgery():
    sd = build_coco_init_state_dict()
    tree = convert_coco_init(sd, fake_template())
    p = tree["params"]
    # surgical layers: fresh from the template at the 2-class shapes
    assert p["classifier"]["linear_class"]["kernel"].shape == (1024, 2)
    assert np.all(p["classifier"]["linear_class"]["kernel"] == 7.0)
    assert p["classifier"]["linear_bbox"]["kernel"].shape == (1024, 8)
    assert p["mask"]["conv1"]["kernel"].shape == (3, 3, 439, 256)
    assert np.all(p["mask"]["conv1"]["kernel"] == 7.0)
    assert p["mask"]["conv5"]["kernel"].shape == (1, 1, 256, 2)
    # everything else: converted from the checkpoint
    assert np.all(p["mask"]["conv2"]["kernel"] == 2.0)
    assert np.all(p["mask"]["frozen_bn1"]["scale"] == 3.0)  # bn1 survives
    assert np.all(p["classifier"]["conv1"]["kernel"] == 4.0)
    assert "glm" not in p  # caller attaches deeplabv2.pth / template GLM


@pytest.mark.slow
def test_coco_init_via_cli_path_trains(tmp_path):
    """The VERDICT gate: an 81-class reference-named state_dict saved as a
    real .pth, resolved through the CLI's weight-selection path, must land on
    the amodal init tree and train one step (``amodal_train.py:595-650``)."""
    torch = pytest.importorskip("torch")
    from fixtures import make_synthetic_dataset

    from sln_amodal_tpu.cli.train import resolve_weights
    from sln_amodal_tpu.data.dataset import AmodalDataset
    from sln_amodal_tpu.data.pipeline import TrainLoader
    from sln_amodal_tpu.parallel.mesh import make_mesh
    from sln_amodal_tpu.train.trainer import Trainer

    cfg = Config(
        image_size=64, glm_input_size=33, pre_nms_limit=100,
        post_nms_rois_training=20, post_nms_rois_inference=20,
        train_rois_per_image=8, detection_max_instances=5,
        max_gt_instances=4, compute_dtype="float32", batch_size=2,
    )
    template = init_params(cfg, jax.random.PRNGKey(0))
    sd = build_coco_init_state_dict()
    path = str(tmp_path / "mask_rcnn_coco.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    args = argparse.Namespace(model=path, glm_weights=str(tmp_path / "none.pth"),
                              logs=str(tmp_path))
    variables = resolve_weights(args, cfg, template)
    assert_tree_matches(variables, template)
    # surgical layers fresh from the init; backbone from the checkpoint zeros
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["mask"]["conv1"]["kernel"]),
        np.asarray(template["params"]["mask"]["conv1"]["kernel"]))
    assert np.all(np.asarray(variables["params"]["fpn"]["stem_conv"]["kernel"]) == 0)
    assert not np.all(np.asarray(template["params"]["fpn"]["stem_conv"]["kernel"]) == 0)

    root = tmp_path / "data"
    make_synthetic_dataset(str(root), n_images=2, size=64)
    ds = AmodalDataset()
    ds.load_amodal(str(root), "train")
    ds.prepare()
    trainer = Trainer(cfg, variables, mesh=make_mesh(jax.devices("cpu")[:2]))
    losses = trainer.train_stage(
        TrainLoader(ds, cfg, batch_size=2, seed=0), "heads", 0.01,
        epochs=1, steps_per_epoch=1)
    assert np.isfinite(losses["total"])
