"""Golden tests for the sem-dist uint64 codec.

Cases are hand-constructed stacks of rectangles with known bit-level
encodings, matching the semantics of the reference decoders
(/root/reference/modal/Functions.py:1010-1132, amodal_train.py:236-271).
"""

import numpy as np
import pytest

from sln_amodal_tpu.data import semdist

U64 = np.uint64


def rect(h, w, y1, x1, y2, x2):
    m = np.zeros((h, w), dtype=bool)
    m[y1:y2, x1:x2] = True
    return m


def test_bits_to_indices():
    assert semdist.bits_to_indices(0) == []
    assert semdist.bits_to_indices(0b1) == [0]
    assert semdist.bits_to_indices(0b1010) == [1, 3]
    assert semdist.bits_to_indices((1 << 35) | 1) == [0, 35]


def test_max_object_id_contiguous():
    ids = np.array([0b1, 0b10, 0b100], dtype=U64)
    assert semdist.max_object_id(ids) == 3


def test_max_object_id_sequential_quirk():
    # The reference scan stops at the first missing top-bit position:
    # labels with top vis bits {0, 2} yield 1, not 3.
    ids = np.array([0b1, 0b100], dtype=U64)
    assert semdist.max_object_id(ids) == 1


def test_encode_two_objects_bit_pattern():
    h = w = 20
    a0 = rect(h, w, 0, 0, 10, 10)       # object 0, behind
    a1 = rect(h, w, 5, 5, 15, 15)       # object 1, in front
    inv0 = a0 & a1                      # obj0 hidden where obj1 covers it

    label = semdist.encode_layer_map([a0, a1], [inv0, None], min_size=1)

    only0 = a0 & ~a1
    overlap = a0 & a1
    only1 = a1 & ~a0
    assert np.all(label[only0] == U64(0b1))
    assert np.all(label[overlap] == (U64(0b10) | (U64(1) << U64(32))))
    assert np.all(label[only1] == U64(0b10))
    assert np.all(label[~(a0 | a1)] == U64(0))


def _two_object_label():
    h = w = 20
    a0 = rect(h, w, 0, 0, 10, 10)
    a1 = rect(h, w, 5, 5, 15, 15)
    inv0 = a0 & a1
    return semdist.encode_layer_map([a0, a1], [inv0, None], min_size=1), a0, a1, inv0


def test_decode_layer_masks_single_layer_is_amodal():
    label, a0, a1, _ = _two_object_label()
    masks, class_ids = semdist.decode_layer_masks(label, num_layers=1)
    assert masks.shape == (20, 20, 1, 2)
    assert np.array_equal(class_ids, [1, 1])
    # num_layers=1: everything collapses into channel 0 = amodal mask.
    np.testing.assert_array_equal(masks[:, :, 0, 0], a0)
    np.testing.assert_array_equal(masks[:, :, 0, 1], a1)


def test_decode_layer_masks_multi_layer():
    label, a0, a1, inv0 = _two_object_label()
    masks, _ = semdist.decode_layer_masks(label, num_layers=3)
    vis0 = a0 & ~inv0
    np.testing.assert_array_equal(masks[:, :, 0, 0], vis0)       # visible
    np.testing.assert_array_equal(masks[:, :, 1, 0], inv0)       # depth 1
    assert not masks[:, :, 2, 0].any()
    np.testing.assert_array_equal(masks[:, :, 0, 1], a1)
    assert not masks[:, :, 1:, 1].any()


def test_decode_layer_masks_depth_overflow():
    # Three stacked objects; where all overlap, obj0 is at depth 1 and obj1 at
    # depth 2 within the label's invisible set (rank by ascending object id).
    h = w = 24
    a0 = rect(h, w, 0, 0, 12, 12)
    a1 = rect(h, w, 4, 4, 16, 16)
    a2 = rect(h, w, 8, 8, 20, 20)
    inv0 = a0 & (a1 | a2)
    inv1 = a1 & a2
    label = semdist.encode_layer_map([a0, a1, a2], [inv0, inv1, None], min_size=1)

    triple = a0 & a1 & a2
    masks3, _ = semdist.decode_layer_masks(label, num_layers=3)
    # num_layers=3 → overflow channel = 2; obj1's depth-2 pixels land there.
    assert masks3[:, :, 2, 1][triple].all()
    # obj0 depth-1 pixels under the triple overlap: invis list there is [0,1],
    # obj0 rank 0 → depth 1 < 2 → channel 1.
    assert masks3[:, :, 1, 0][triple].all()

    masks4, _ = semdist.decode_layer_masks(label, num_layers=4)
    assert masks4[:, :, 2, 1][triple].all()
    assert not masks4[:, :, 3, 1][triple].any()


def test_decode_instance_masks_roundtrip():
    label, a0, a1, inv0 = _two_object_label()
    amodal, class_ids, vis, invis = semdist.decode_instance_masks(label)
    assert amodal.shape == (20, 20, 2)
    np.testing.assert_array_equal(amodal[:, :, 0], a0)
    np.testing.assert_array_equal(amodal[:, :, 1], a1)
    np.testing.assert_array_equal(vis[:, :, 0], a0 & ~inv0)
    np.testing.assert_array_equal(invis[:, :, 0], inv0)
    assert np.array_equal(class_ids, [1, 1])


def test_remove_small_patches():
    label = np.zeros((20, 20), dtype=U64)
    label[0:10, 0:10] = U64(1)   # 100 px — survives min_size=64
    label[15:17, 15:17] = U64(2)  # 4 px — removed
    out = semdist.remove_small_patches(label, min_size=64)
    assert np.all(out[0:10, 0:10] == U64(1))
    assert np.all(out[15:17, 15:17] == U64(0))


def test_remove_small_patches_survives_if_any_component_big():
    label = np.zeros((30, 30), dtype=U64)
    label[0:10, 0:10] = U64(1)    # big component of color 1
    label[20:22, 20:22] = U64(1)  # small component, same color — color kept
    out = semdist.remove_small_patches(label, min_size=64)
    assert np.all(out == label)


def test_encoder_skips_objects_past_32():
    h = w = 8
    masks = [rect(h, w, 0, 0, 8, 8) for _ in range(33)]
    invs = [None] * 33
    label = semdist.encode_layer_map(masks, invs, min_size=1)
    # object 32 contributes no bits; objects 0..31 all claim visibility.
    assert np.all(label == U64((1 << 32) - 1))


def test_object_masks_union_semantics():
    label, a0, a1, inv0 = _two_object_label()
    v, iv = semdist.object_masks(label, 0)
    np.testing.assert_array_equal(v, a0 & ~inv0)
    np.testing.assert_array_equal(iv, inv0)
    v1, iv1 = semdist.object_masks(label, 1)
    np.testing.assert_array_equal(v1, a1)
    assert not iv1.any()


def test_empty_label_map():
    label = np.zeros((8, 8), dtype=U64)
    masks, class_ids = semdist.decode_layer_masks(label, num_layers=2)
    assert masks.shape == (8, 8, 2, 0)
    assert class_ids.size == 0
