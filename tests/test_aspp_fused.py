"""The fused-matmul ASPP must match the dilated-convolution formulation
(the reference ``_ASPP``, resnet_deeplab.py) exactly: same param tree,
same init values, same outputs up to float summation order.

The fused path exists because XLA's dilated-conv lowering is the hottest
op of the GLM on TPU (7.2 ms at [1,65,65,2048] bf16 on v5e vs ~1 ms fused).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sln_amodal_tpu.models.deeplab import ASPP


class DilatedConvASPP(nn.Module):
    """The naive formulation: four dilated 3x3 convs, summed."""

    n_classes: int
    rates: tuple = (6, 12, 18, 24)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        for i, rate in enumerate(self.rates):
            outs.append(
                nn.Conv(
                    self.n_classes, (3, 3),
                    padding=[(rate, rate)] * 2,
                    kernel_dilation=(rate, rate),
                    use_bias=True, dtype=self.dtype, name=f"c{i}",
                )(x)
            )
        return sum(outs)


def _flat(tree):
    return {
        jax.tree_util.keystr(p): np.asarray(a)
        for p, a in jax.tree_util.tree_leaves_with_path(tree)
    }


@pytest.mark.parametrize("hw,cin,cout,rates", [
    (21, 12, 6, (1, 2, 3, 5)),
    (13, 16, 7, (2, 4, 6, 8)),
    # reference rates on a grid smaller than the atrous reach: every
    # rate-24 off-center tap reads entirely outside the frame
    (9, 8, 5, (6, 12, 18, 24)),
])
def test_fused_matches_dilated_conv(hw, cin, cout, rates):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, hw, hw, cin).astype(np.float32))
    ref = DilatedConvASPP(cout, rates)
    fused = ASPP(cout, rates)

    v_ref = ref.init(jax.random.PRNGKey(1), x)
    v_fused = fused.init(jax.random.PRNGKey(1), x)
    f_ref, f_fused = _flat(v_ref), _flat(v_fused)
    assert sorted(f_ref) == sorted(f_fused)
    for k in f_ref:  # same tree, same shapes, same RNG draws
        np.testing.assert_array_equal(f_ref[k], f_fused[k])

    a = np.asarray(ref.apply(v_ref, x))
    b = np.asarray(fused.apply(v_ref, x))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_fused_matches_in_float64():
    """x64: agreement to ~1e-12 proves the formulations are algebraically
    identical (not merely close)."""
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(1, 17, 17, 8).astype(np.float64))
        ref = DilatedConvASPP(5, (2, 5, 7), dtype=jnp.float64)
        fused = ASPP(5, (2, 5, 7), dtype=jnp.float64)
        v = ref.init(jax.random.PRNGKey(1), x)
        a = np.asarray(ref.apply(v, x))
        b = np.asarray(fused.apply(v, x))
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)
