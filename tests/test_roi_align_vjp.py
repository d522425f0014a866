"""Custom-VJP pyramid RoIAlign: forward identical to the gather version,
backward identical to autodiff-through-gather."""

import numpy as np

import jax
import jax.numpy as jnp

from sln_amodal_tpu.ops.roi_align import pyramid_roi_align, pyramid_roi_align_gather


def make_case(seed=0, n=12, c=8):
    rng = np.random.RandomState(seed)
    feats = tuple(
        jnp.asarray(rng.randn(s, s, c).astype(np.float32)) for s in (64, 32, 16, 8)
    )
    small = 224.0 / 1024.0 / 4
    big = 448.0 / 1024.0
    boxes = []
    for i in range(n):
        size = small if i % 3 == 0 else (big if i % 3 == 1 else small * 2)
        y, x = rng.rand(2) * (1 - size)
        boxes.append([y, x, y + size, x + size])
    return feats, jnp.asarray(np.asarray(boxes, np.float32))


def test_forward_matches_gather():
    feats, boxes = make_case()
    a = pyramid_roi_align(feats, boxes, (7, 7), (256, 256))
    b = pyramid_roi_align_gather(feats, boxes, (7, 7), (256, 256))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_backward_matches_gather_autodiff():
    feats, boxes = make_case(seed=1)
    rng = np.random.RandomState(2)
    cotangent = jnp.asarray(
        rng.randn(boxes.shape[0], 7, 7, feats[0].shape[-1]).astype(np.float32)
    )

    def loss_custom(fs):
        return jnp.sum(pyramid_roi_align(fs, boxes, (7, 7), (256, 256)) * cotangent)

    def loss_gather(fs):
        return jnp.sum(
            pyramid_roi_align_gather(fs, boxes, (7, 7), (256, 256)) * cotangent
        )

    g_custom = jax.grad(loss_custom)(feats)
    g_gather = jax.grad(loss_gather)(feats)
    for gc, gg in zip(g_custom, g_gather):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gg), atol=1e-4)


def test_boxes_gradient_is_zero():
    feats, boxes = make_case(seed=3)

    def loss(b):
        return jnp.sum(pyramid_roi_align(feats, b, (3, 3), (256, 256)))

    g = jax.grad(loss)(boxes)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_jit_grad_through_custom_vjp():
    feats, boxes = make_case(seed=4)

    def loss(fs):
        return jnp.sum(pyramid_roi_align(fs, boxes, (5, 5), (256, 256)) ** 2)

    g = jax.jit(jax.grad(loss))(feats)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()


# ---------------------------------------------------------- batch-native ----


def make_batched_case(seed=0, b=3, n=12, c=8):
    rng = np.random.RandomState(seed)
    feats = tuple(
        jnp.asarray(rng.randn(b, s, s, c).astype(np.float32))
        for s in (64, 32, 16, 8)
    )
    small = 224.0 / 1024.0 / 4
    big = 448.0 / 1024.0
    boxes = np.empty((b, n, 4), np.float32)
    for bi in range(b):
        for i in range(n):
            size = small if i % 3 == 0 else (big if i % 3 == 1 else small * 2)
            y, x = rng.rand(2) * (1 - size)
            boxes[bi, i] = [y, x, y + size, x + size]
    return feats, jnp.asarray(boxes)


def test_batched_forward_matches_per_image():
    from sln_amodal_tpu.ops.roi_align import pyramid_roi_align_batched

    feats, boxes = make_batched_case()
    out = pyramid_roi_align_batched(feats, boxes, (7, 7), (256, 256))
    ref = jax.vmap(
        lambda p2, p3, p4, p5, bx: pyramid_roi_align(
            (p2, p3, p4, p5), bx, (7, 7), (256, 256))
    )(*feats, boxes)
    # identical per-box arithmetic, only the gather table layout differs
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_batched_backward_matches_per_image():
    from sln_amodal_tpu.ops.roi_align import pyramid_roi_align_batched

    feats, boxes = make_batched_case(seed=5)
    rng = np.random.RandomState(6)
    cot = jnp.asarray(
        rng.randn(boxes.shape[0], boxes.shape[1], 7, 7,
                  feats[0].shape[-1]).astype(np.float32))

    def loss_batched(fs):
        return jnp.sum(
            pyramid_roi_align_batched(fs, boxes, (7, 7), (256, 256)) * cot)

    def loss_vmapped(fs):
        out = jax.vmap(
            lambda p2, p3, p4, p5, bx: pyramid_roi_align(
                (p2, p3, p4, p5), bx, (7, 7), (256, 256))
        )(*fs, boxes)
        return jnp.sum(out * cot)

    g_b = jax.grad(loss_batched)(feats)
    g_v = jax.grad(loss_vmapped)(feats)
    for gb, gv in zip(g_b, g_v):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gv), atol=1e-4)


def test_batched_b1_slice_is_per_image_op():
    from sln_amodal_tpu.ops.roi_align import pyramid_roi_align_batched

    feats, boxes = make_batched_case(seed=7, b=1)
    out = pyramid_roi_align_batched(feats, boxes, (5, 5), (256, 256))
    ref = pyramid_roi_align(
        tuple(f[0] for f in feats), boxes[0], (5, 5), (256, 256))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref))


def test_batched_boxes_gradient_is_zero():
    from sln_amodal_tpu.ops.roi_align import pyramid_roi_align_batched

    feats, boxes = make_batched_case(seed=8)

    def loss(bx):
        return jnp.sum(pyramid_roi_align_batched(feats, bx, (3, 3), (256, 256)))

    g = jax.grad(loss)(boxes)
    np.testing.assert_array_equal(np.asarray(g), 0.0)
