"""Force the numpy fallback path of the RLE API and cross-check it against
the native library results."""

import numpy as np
import pytest

from sln_amodal_tpu.eval_amodal import rle


@pytest.fixture
def no_native(monkeypatch):
    monkeypatch.setattr(rle, "_lib", None)
    monkeypatch.setattr(rle, "_lib_checked", True)
    yield
    # monkeypatch restores automatically


def masks(seed=0, n=3, h=21, w=17):
    rng = np.random.RandomState(seed)
    return [(rng.rand(h, w) < 0.4).astype(np.uint8) for _ in range(n)]


def test_fallback_encode_decode(no_native):
    for m in masks():
        r = rle.encode(np.asfortranarray(m))
        np.testing.assert_array_equal(rle.decode(r), m)


def test_fallback_matches_native_strings():
    ms = masks(1)
    native = [rle.encode(np.asfortranarray(m))["counts"] for m in ms]
    # now force fallback
    saved = rle._lib
    rle._lib = None
    try:
        fallback = [rle.encode(np.asfortranarray(m))["counts"] for m in ms]
    finally:
        rle._lib = saved
    assert native == fallback


def test_fallback_iou_merge_area(no_native):
    a, b, _ = masks(2)
    ra = rle.encode(np.asfortranarray(a))
    rb = rle.encode(np.asfortranarray(b))
    assert rle.area(ra) == int(a.sum())
    u = rle.decode(rle.merge([ra, rb]))
    np.testing.assert_array_equal(u, a | b)
    got = rle.iou([ra], [rb], [0])[0, 0]
    inter = (a & b).sum()
    union = (a | b).sum()
    np.testing.assert_allclose(got, inter / union)


def test_fallback_frpoly_matches_native():
    poly = [2.0, 2.0, 2.0, 14.0, 12.0, 14.0, 12.0, 2.0]
    native = rle.counts_from_poly(poly, 20, 20)
    saved = rle._lib
    rle._lib = None
    try:
        fb = rle.counts_from_poly(poly, 20, 20)
    finally:
        rle._lib = saved
    np.testing.assert_array_equal(native, fb)


def test_fallback_encode_pasted(no_native):
    rng = np.random.RandomState(3)
    crop = rng.randint(0, 2, (7, 5)).astype(np.uint8)
    got = rle.encode_pasted_counts(crop, 4, 6, 20, 30)
    full = np.zeros((20, 30), np.uint8)
    full[4:11, 6:11] = crop
    np.testing.assert_array_equal(got, rle.encode_counts(full))
