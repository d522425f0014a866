"""Matmul reformulations of head layers must be exactly equivalent to the
nn.Conv / nn.ConvTranspose forms they replace (same param tree, same init
draws, same outputs): FullKernelConv (classifier k=pool conv),
DepthToSpaceDeconv (mask-head 2x2-stride-2 deconv), and the RPN head's fused
class+bbox 1x1 matmul."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sln_amodal_tpu.models.common import DepthToSpaceDeconv, FullKernelConv
from sln_amodal_tpu.models.heads import RPNHead


def _flat(tree):
    return {
        jax.tree_util.keystr(p): np.asarray(a)
        for p, a in jax.tree_util.tree_leaves_with_path(tree)
    }


def _assert_same_tree(v1, v2):
    f1, f2 = _flat(v1), _flat(v2)
    assert sorted(f1) == sorted(f2), (sorted(f1), sorted(f2))
    for k in f1:
        np.testing.assert_array_equal(f1[k], f2[k])


def test_full_kernel_conv_matches_nn_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(9, 7, 7, 24).astype(np.float32))

    ref = nn.Conv(32, (7, 7), padding="VALID")
    ours = FullKernelConv(32, (7, 7))
    v_ref = ref.init(jax.random.PRNGKey(2), x)
    v_ours = ours.init(jax.random.PRNGKey(2), x)
    _assert_same_tree(v_ref, v_ours)

    a = np.asarray(ref.apply(v_ref, x))
    b = np.asarray(ours.apply(v_ref, x))
    assert a.shape == b.shape == (9, 1, 1, 32)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_depth_to_space_deconv_matches_nn_conv_transpose():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(5, 6, 6, 12).astype(np.float32))

    ref = nn.ConvTranspose(16, (2, 2), strides=(2, 2), padding="VALID")
    ours = DepthToSpaceDeconv(16)
    v_ref = ref.init(jax.random.PRNGKey(3), x)
    v_ours = ours.init(jax.random.PRNGKey(3), x)
    _assert_same_tree(v_ref, v_ours)

    a = np.asarray(ref.apply(v_ref, x))
    b = np.asarray(ours.apply(v_ref, x))
    assert a.shape == b.shape == (5, 12, 12, 16)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


class TwoConvRPN(nn.Module):
    """The pre-fusion RPN head formulation (separate 1x1 convs)."""

    anchors_per_location: int = 3

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        shared = nn.Conv(512, (3, 3), padding="SAME", name="conv_shared")(x)
        shared = nn.relu(shared)
        logits = nn.Conv(2 * self.anchors_per_location, (1, 1),
                         name="conv_class")(shared).reshape(b, -1, 2)
        probs = nn.softmax(logits, axis=-1)
        deltas = nn.Conv(4 * self.anchors_per_location, (1, 1),
                         name="conv_bbox")(shared).reshape(b, -1, 4)
        return logits, probs, deltas


def test_rpn_fused_matmul_matches_two_convs():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 20).astype(np.float32))

    ref = TwoConvRPN()
    ours = RPNHead()
    v_ref = ref.init(jax.random.PRNGKey(4), x)
    v_ours = ours.init(jax.random.PRNGKey(4), x)
    _assert_same_tree(v_ref, v_ours)

    a = ref.apply(v_ref, x)
    b = ours.apply(v_ref, x)
    for t_ref, t_ours in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(t_ref), np.asarray(t_ours), rtol=1e-5, atol=1e-6
        )
