"""Full-module torch parity: RPN head and classifier head.

The RPN reshape convention (anchor-major (bg, fg) pairs) and the
classifier's conv-as-FC stack are where converted checkpoints would silently
misbehave; these tests run reference-structured torch modules and compare
activations end-to-end through the converter.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sln_amodal_tpu.convert import torch_weights as cv  # noqa: E402
from sln_amodal_tpu.models.heads import ClassifierHead, RPNHead  # noqa: E402


def randomize_bn(bn):
    with torch.no_grad():
        bn.weight.copy_(torch.rand_like(bn.weight) + 0.5)
        bn.bias.copy_(torch.randn_like(bn.bias) * 0.1)
        bn.running_mean.copy_(torch.randn_like(bn.running_mean) * 0.2)
        bn.running_var.copy_(torch.rand_like(bn.running_var) + 0.5)


class TorchRPN(tnn.Module):
    """Reference RPN structure (modals.py:361-412): TF-SAME 3x3 shared conv,
    per-anchor 2-logit pairs reshaped anchor-major."""

    def __init__(self, anchors_per_location=3):
        super().__init__()
        self.conv_shared = tnn.Conv2d(256, 512, 3, stride=1)
        self.conv_class = tnn.Conv2d(512, 2 * anchors_per_location, 1)
        self.conv_bbox = tnn.Conv2d(512, 4 * anchors_per_location, 1)

    def forward(self, x):
        x = tF.pad(x, (1, 1, 1, 1))
        x = tF.relu(self.conv_shared(x))
        logits = self.conv_class(x).permute(0, 2, 3, 1).contiguous()
        logits = logits.view(x.size(0), -1, 2)
        probs = tF.softmax(logits, dim=2)
        bbox = self.conv_bbox(x).permute(0, 2, 3, 1).contiguous()
        bbox = bbox.view(x.size(0), -1, 4)
        return logits, probs, bbox


def test_rpn_head_parity():
    torch.manual_seed(0)
    trpn = TorchRPN()
    x = torch.randn(1, 256, 8, 8)
    ref_logits, ref_probs, ref_bbox = (t.detach().numpy() for t in trpn(x))

    sd = {f"rpn.{k}": v.detach().numpy() for k, v in trpn.state_dict().items()}
    params = {"params": cv.convert_rpn(sd)}
    head = RPNHead(anchors_per_location=3)
    logits, probs, bbox = head.apply(
        {"params": params["params"]}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=1e-4)
    np.testing.assert_allclose(np.asarray(probs), ref_probs, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bbox), ref_bbox, atol=1e-4)


class TorchClassifier(tnn.Module):
    """Reference classifier structure (modals.py:419-453), post-surgery
    2-class linears, frozen BN."""

    def __init__(self, num_classes=2, pool=7):
        super().__init__()
        self.conv1 = tnn.Conv2d(256, 1024, pool, stride=1)
        self.bn1 = tnn.BatchNorm2d(1024, eps=1e-3)
        self.conv2 = tnn.Conv2d(1024, 1024, 1)
        self.bn2 = tnn.BatchNorm2d(1024, eps=1e-3)
        self.linear_class = tnn.Linear(1024, num_classes)
        self.linear_bbox = tnn.Linear(1024, num_classes * 4)

    def forward(self, x):
        x = tF.relu(self.bn1(self.conv1(x)))
        x = tF.relu(self.bn2(self.conv2(x)))
        x = x.view(-1, 1024)
        logits = self.linear_class(x)
        probs = tF.softmax(logits, dim=1)
        bbox = self.linear_bbox(x).view(x.size(0), -1, 4)
        return logits, probs, bbox


def test_classifier_head_parity():
    torch.manual_seed(1)
    tcls = TorchClassifier()
    for m in tcls.modules():
        if isinstance(m, tnn.BatchNorm2d):
            randomize_bn(m)
    tcls.eval()
    x = torch.randn(5, 256, 7, 7)
    ref_logits, ref_probs, ref_bbox = (t.detach().numpy() for t in tcls(x))

    sd = {f"classifier.{k}": v.detach().numpy() for k, v in tcls.state_dict().items()}
    params = cv.convert_classifier(sd)
    head = ClassifierHead(num_classes=2, pool_size=7)
    logits, probs, bbox = head.apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=1e-3)
    np.testing.assert_allclose(np.asarray(probs), ref_probs, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bbox), ref_bbox, atol=1e-3)


class TorchDLBottleneck(tnn.Module):
    """DeepLab bottleneck structure (resnet_deeplab.py:49-71): dilated 3x3,
    no-bias convs, BN eps 1e-5."""

    def __init__(self, cin, cout, stride, dilation, downsample):
        super().__init__()
        mid = cout // 4

        def cbn(ci, co, k, s, p, d):
            return tnn.Sequential(
                tnn.Conv2d(ci, co, k, s, p, d, bias=False),
                tnn.BatchNorm2d(co, eps=1e-5),
            )

        self.reduce = cbn(cin, mid, 1, stride, 0, 1)
        self.conv3x3 = cbn(mid, mid, 3, 1, dilation, dilation)
        self.increase = cbn(mid, cout, 1, 1, 0, 1)
        self.shortcut = cbn(cin, cout, 1, stride, 0, 1) if downsample else None

    def forward(self, x):
        h = tF.relu(self.reduce(x))
        h = tF.relu(self.conv3x3(h))
        h = self.increase(h)
        sc = self.shortcut(x) if self.shortcut is not None else x
        return tF.relu(h + sc)


def test_deeplab_bottleneck_parity():
    from sln_amodal_tpu.models.deeplab import DLBottleneck

    torch.manual_seed(2)
    tb = TorchDLBottleneck(16, 32, stride=1, dilation=2, downsample=True)
    for m in tb.modules():
        if isinstance(m, tnn.BatchNorm2d):
            randomize_bn(m)
    tb.eval()
    x = torch.randn(1, 16, 12, 12)
    ref = tb(x).detach().numpy().transpose(0, 2, 3, 1)

    sd = {f"base.layer2.block1.{k.replace('.0.', '.conv.').replace('.1.', '.bn.')}":
          v.detach().numpy() for k, v in tb.state_dict().items()}
    # convert via the cbn helper path used by convert_deeplab
    def cbn_params(name):
        return {
            "conv": cv._conv(sd, f"{name}.conv", bias=False),
            "frozen_bn": cv._bn(sd, f"{name}.bn"),
        }

    p = {
        "reduce": cbn_params("base.layer2.block1.reduce"),
        "conv3x3": cbn_params("base.layer2.block1.conv3x3"),
        "increase": cbn_params("base.layer2.block1.increase"),
        "shortcut": cbn_params("base.layer2.block1.shortcut"),
    }
    model = DLBottleneck(32, stride=1, dilation=2, downsample=True)
    got = model.apply({"params": p}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)
