"""The three lowerings of the GLM trunk's 3x3 dilated convs must be the
same function: XLA ``kernel_dilation`` conv (reference semantics, torch
Conv2d padding=dilation — /root/reference/modal/resnet_deeplab.py), the
space-to-batch dense conv, and the tap-matmul form differ only in f32
summation order, and share nn.Conv's exact param tree so converted
checkpoints load into any of them unchanged."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sln_amodal_tpu.models.deeplab import (
    ConvBN,
    DeepLabV2,
    dilated3x3_space_to_batch,
    dilated3x3_tap_matmul,
)


def _ref_conv(x, k, r):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(r, r), (r, r)], rhs_dilation=(r, r),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("rate", [2, 4])
@pytest.mark.parametrize("hw", [13, 16, 9])
def test_lowerings_match_dilated_conv(rate, hw):
    rng = np.random.RandomState(rate * 100 + hw)
    x = jnp.asarray(rng.randn(2, hw, hw, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 8, 6).astype(np.float32))
    ref = np.asarray(_ref_conv(x, k, rate))
    np.testing.assert_allclose(
        np.asarray(dilated3x3_space_to_batch(x, k, rate)), ref,
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dilated3x3_tap_matmul(x, k, rate)), ref,
        rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("rate", [2, 4])
def test_lowerings_match_f64(rate):
    """Under x64 (the parity-test mode) the agreement is ~exact."""
    with jax.enable_x64(True):
        rng = np.random.RandomState(rate)
        x = jnp.asarray(rng.randn(1, 11, 11, 4))
        k = jnp.asarray(rng.randn(3, 3, 4, 4))
        assert x.dtype == jnp.float64
        ref = np.asarray(_ref_conv(x, k, rate))
        for fn in (dilated3x3_space_to_batch, dilated3x3_tap_matmul):
            got = np.asarray(fn(x, k, rate))
            assert got.dtype == np.float64
            np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("lowering", ["s2b", "tapmm"])
def test_convbn_lowering_same_params_same_output(lowering):
    """ConvBN with an alternative lowering: identical param tree (checkpoint
    compatibility) and matching output."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 13, 13, 8).astype(np.float32))

    base = ConvBN(6, 3, 1, 2, 2, True, jnp.float32)
    alt = ConvBN(6, 3, 1, 2, 2, True, jnp.float32, dilated_lowering=lowering)
    v = base.init(jax.random.PRNGKey(0), x)
    v_alt = alt.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v_alt)
    assert all(
        a.shape == b.shape
        for a, b in zip(jax.tree_util.tree_leaves(v),
                        jax.tree_util.tree_leaves(v_alt)))
    np.testing.assert_allclose(
        np.asarray(alt.apply(v, x)), np.asarray(base.apply(v, x)),
        rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("lowering", ["s2b", "tapmm"])
def test_deeplab_trunk_lowering_equivalent(lowering):
    """Whole DeepLabV2 forward (tiny grid) agrees across lowerings with
    shared params — layer4/5 are the only consumers of the knob."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 33, 33, 3).astype(np.float32))
    base = DeepLabV2(n_classes=7, n_blocks=(1, 1, 2, 1), dtype=jnp.float32)
    alt = DeepLabV2(n_classes=7, n_blocks=(1, 1, 2, 1), dtype=jnp.float32,
                    dilated_lowering=lowering)
    v = base.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(alt.apply(v, x)), np.asarray(base.apply(v, x)),
        rtol=2e-4, atol=2e-4)
