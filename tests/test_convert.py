"""Numeric parity of converted torch weights vs flax modules.

Builds small torch graphs with the same structure as the reference blocks
(conv+frozen-BN bottleneck, TF-SAME padding, transposed conv, classifier
head), converts their state_dicts with sln_amodal_tpu.convert, and checks
activations match to float tolerance. This validates every layout rule the
full-checkpoint converter relies on.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import flax.linen as nn  # noqa: E402

from sln_amodal_tpu.convert import torch_weights as cv  # noqa: E402
from sln_amodal_tpu.models.backbone import Bottleneck  # noqa: E402
from sln_amodal_tpu.models.common import FrozenBatchNorm  # noqa: E402
from sln_amodal_tpu.models.heads import MaskHead  # noqa: E402


def sd_numpy(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def randomize_bn(bn):
    with torch.no_grad():
        bn.weight.copy_(torch.rand_like(bn.weight) + 0.5)
        bn.bias.copy_(torch.randn_like(bn.bias) * 0.1)
        bn.running_mean.copy_(torch.randn_like(bn.running_mean) * 0.2)
        bn.running_var.copy_(torch.rand_like(bn.running_var) + 0.5)


def test_conv_bn_parity():
    torch.manual_seed(0)
    conv = tnn.Conv2d(3, 8, 3, stride=1, padding=1)
    bn = tnn.BatchNorm2d(8, eps=1e-3)
    randomize_bn(bn)
    bn.eval()

    x = torch.randn(2, 3, 16, 16)
    ref = bn(conv(x)).detach().numpy().transpose(0, 2, 3, 1)

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)], name="conv")(x)
            return FrozenBatchNorm(epsilon=1e-3, name="frozen_bn")(y)

    sd = {f"conv.{k}": v for k, v in sd_numpy(conv).items()}
    sd.update({f"bn.{k}": v for k, v in sd_numpy(bn).items()})
    params = {"params": {"conv": cv._conv(sd, "conv"), "frozen_bn": cv._bn(sd, "bn")}}
    got = M().apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_strided_conv_7x7_pad3_parity():
    """The stem conv: torch symmetric pad 3, stride 2."""
    torch.manual_seed(1)
    conv = tnn.Conv2d(3, 4, 7, stride=2, padding=3)
    x = torch.randn(1, 3, 32, 32)
    ref = conv(x).detach().numpy().transpose(0, 2, 3, 1)

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(4, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                           name="c")(x)

    params = {"params": {"c": cv._conv(sd_numpy_prefixed(conv, "c"), "c")}}
    got = M().apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def sd_numpy_prefixed(mod, prefix):
    return {f"{prefix}.{k}": v.detach().numpy() for k, v in mod.state_dict().items()}


def test_linear_parity():
    torch.manual_seed(2)
    lin = tnn.Linear(16, 5)
    x = torch.randn(3, 16)
    ref = lin(x).detach().numpy()

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(5, name="d")(x)

    params = {"params": {"d": cv._linear(sd_numpy_prefixed(lin, "d"), "d")}}
    got = M().apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_deconv_2x2_s2_parity():
    """mask.deconv: ConvTranspose2d(256→256, k2, s2) — layout check."""
    torch.manual_seed(3)
    dc = tnn.ConvTranspose2d(6, 4, 2, stride=2)
    x = torch.randn(2, 6, 5, 5)
    ref = dc(x).detach().numpy().transpose(0, 2, 3, 1)

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.ConvTranspose(4, (2, 2), strides=(2, 2), padding="VALID",
                                    name="dc")(x)

    params = {"params": {"dc": cv._deconv(sd_numpy_prefixed(dc, "dc"), "dc")}}
    got = M().apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


class TorchBottleneck(tnn.Module):
    """Structure of the reference Matterport bottleneck (stride on 1x1,
    TF-SAME 3x3) for conversion testing."""

    def __init__(self, cin, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, stride=stride)
        self.bn1 = tnn.BatchNorm2d(planes, eps=1e-3)
        self.conv2 = tnn.Conv2d(planes, planes, 3)
        self.bn2 = tnn.BatchNorm2d(planes, eps=1e-3)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1)
        self.bn3 = tnn.BatchNorm2d(planes * 4, eps=1e-3)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride=stride),
                tnn.BatchNorm2d(planes * 4, eps=1e-3),
            )

    def forward(self, x):
        r = x
        y = tF.relu(self.bn1(self.conv1(x)))
        y = tF.pad(y, (1, 1, 1, 1))
        y = tF.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.downsample is not None:
            r = self.downsample(x)
        return tF.relu(y + r)


@pytest.mark.parametrize("stride,downsample", [(1, False), (2, True)])
def test_bottleneck_parity(stride, downsample):
    torch.manual_seed(4)
    cin = 16 if not downsample else 8
    tb = TorchBottleneck(cin, 4, stride=stride, downsample=downsample)
    for m in tb.modules():
        if isinstance(m, tnn.BatchNorm2d):
            randomize_bn(m)
    tb.eval()
    x = torch.randn(1, cin, 12, 12)
    ref = tb(x).detach().numpy().transpose(0, 2, 3, 1)

    # map through the stage converter path: emulate "fpn.C2.0.*" keys
    sd = {f"fpn.C2.0.{k}": v.detach().numpy() for k, v in tb.state_dict().items()}
    blk = {}
    for i in (1, 2, 3):
        blk[f"conv{i}"] = cv._conv(sd, f"fpn.C2.0.conv{i}")
        blk[f"frozen_bn{i}"] = cv._bn(sd, f"fpn.C2.0.bn{i}")
    if downsample:
        blk["downsample_conv"] = cv._conv(sd, "fpn.C2.0.downsample.0")
        blk["downsample_frozen_bn"] = cv._bn(sd, "fpn.C2.0.downsample.1")

    model = Bottleneck(4, stride=stride, downsample=downsample)
    got = model.apply({"params": blk}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_mask_head_converted_shapes():
    """End-to-end converter on a surgery-shaped torch mask head."""
    torch.manual_seed(5)

    class TMask(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(439, 256, 3)
            self.bn1 = tnn.BatchNorm2d(256, eps=1e-3)
            self.conv2 = tnn.Conv2d(256, 256, 3)
            self.bn2 = tnn.BatchNorm2d(256, eps=1e-3)
            self.conv3 = tnn.Conv2d(256, 256, 3)
            self.bn3 = tnn.BatchNorm2d(256, eps=1e-3)
            self.conv4 = tnn.Conv2d(256, 256, 3)
            self.bn4 = tnn.BatchNorm2d(256, eps=1e-3)
            self.deconv = tnn.ConvTranspose2d(256, 256, 2, stride=2)
            self.conv5 = tnn.Conv2d(256, 2, 1)

    tm = TMask()
    sd = {f"mask.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    p = cv.convert_mask_head(sd)

    head = MaskHead(num_classes=2)
    fpn_crop = jnp.zeros((3, 16, 16, 256))
    glm_crop = jnp.zeros((3, 16, 16, 183))
    logits, feat = head.apply({"params": p}, fpn_crop, glm_crop)
    assert logits.shape == (3, 32, 32, 2)
    assert feat.shape == (3, 16, 16, 256)
