"""resize_bilinear must match torch F.interpolate(align_corners=False)
exactly for upscale AND downscale (jax.image.resize antialiases on
downscale — the round-1 implementation silently diverged from the
reference's GLM input path, model.py:535)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as tF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from sln_amodal_tpu.models.common import resize_bilinear  # noqa: E402


@pytest.mark.parametrize("hw_in,hw_out", [
    ((16, 16), (33, 33)),    # upscale, odd
    ((16, 16), (9, 9)),      # downscale
    ((64, 64), (33, 33)),    # ~2x downscale (GLM input path shape class)
    ((33, 33), (16, 16)),    # MSC scale-0.5 class
    ((33, 33), (24, 24)),    # MSC scale-0.75 class
    ((9, 9), (64, 64)),      # label upsample class
    ((16, 24), (24, 16)),    # non-square both ways
])
def test_matches_torch(hw_in, hw_out):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *hw_in, 3).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), hw_out))
    ref = tF.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=hw_out,
        mode="bilinear", align_corners=False,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_identity():
    x = np.random.RandomState(1).randn(1, 8, 8, 2).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(resize_bilinear(jnp.asarray(x), (8, 8))), x)


@pytest.mark.parametrize("hw_in,hw_out", [
    ((64, 64), (33, 33)),    # GLM input downscale class
    ((9, 9), (64, 64)),      # label upsample class
])
def test_bf16_resize_drift(hw_in, hw_out):
    """The bf16 fast path rounds both data AND the interpolation weights to
    bf16 (~2^-9 relative each); drift vs the f32 path must stay at combined
    bf16-rounding magnitude, not worse."""
    rng = np.random.RandomState(2)
    x = rng.randn(1, *hw_in, 4).astype(np.float32)
    f32 = np.asarray(resize_bilinear(jnp.asarray(x), hw_out))
    bf16 = np.asarray(
        resize_bilinear(jnp.asarray(x).astype(jnp.bfloat16), hw_out)
    ).astype(np.float32)
    scale = np.abs(f32).max()
    # two bf16 roundings (weights + data) plus the input cast: ~3 ulps
    assert np.abs(bf16 - f32).max() <= 3 * 2.0**-8 * scale


@pytest.mark.parametrize("hw_in,hw_out", [((65, 65), (128, 128)),
                                          ((33, 47), (64, 80))])
def test_resize_2d_matches_4d_channel1(hw_in, hw_out):
    """resize_bilinear_2d (the GLM label upsample's lane-friendly form) must
    equal the 4-D path on a [..., 1] map — same matrices, same order."""
    from sln_amodal_tpu.models.common import resize_bilinear, resize_bilinear_2d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, *hw_in).astype(np.float32))
    a = resize_bilinear_2d(x, hw_out)
    b = resize_bilinear(x[..., None], hw_out)[..., 0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)
