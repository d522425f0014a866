"""Bit-exactness cross-validation of our RLE library against the original
COCO maskApi C library, compiled on the fly from the reference checkout into
/tmp and driven via ctypes (test-time oracle only — nothing is vendored).

Skipped automatically when the reference tree or a C compiler is absent.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from sln_amodal_tpu.eval_amodal import rle

REF_SRC = "/root/reference/cocoapi/common/maskApi.c"
REF_INC = "/root/reference/cocoapi/common"


@pytest.fixture(scope="module")
def oracle():
    if not os.path.exists(REF_SRC):
        pytest.skip("reference cocoapi not available")
    lib_path = "/tmp/ref_maskapi.so"
    try:
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", REF_SRC, "-I", REF_INC,
             "-o", lib_path],
            check=True, capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        pytest.skip("cannot compile oracle")
    lib = ctypes.CDLL(lib_path)
    return lib


class RefRLE(ctypes.Structure):
    _fields_ = [
        ("h", ctypes.c_ulong),
        ("w", ctypes.c_ulong),
        ("m", ctypes.c_ulong),
        ("cnts", ctypes.POINTER(ctypes.c_uint)),
    ]


def ref_counts(r: RefRLE) -> np.ndarray:
    return np.asarray([r.cnts[i] for i in range(r.m)], np.uint32)


def make_ref_rle(lib, counts: np.ndarray, h: int, w: int) -> RefRLE:
    r = RefRLE()
    arr = (ctypes.c_uint * len(counts))(*[int(c) for c in counts])
    lib.rleInit(ctypes.byref(r), int(h), int(w), len(counts), arr)
    return r


def test_encode_matches_oracle(oracle):
    rng = np.random.RandomState(0)
    for _ in range(5):
        h, w = (int(v) for v in rng.randint(5, 40, 2))
        m = (rng.rand(h, w) < 0.5).astype(np.uint8)
        flat = np.asfortranarray(m).reshape(-1, order="F")
        r = RefRLE()
        buf = (ctypes.c_ubyte * len(flat))(*flat.tolist())
        oracle.rleEncode(ctypes.byref(r), buf, int(h), int(w), 1)
        np.testing.assert_array_equal(rle.encode_counts(m), ref_counts(r))


def test_string_codec_matches_oracle(oracle):
    oracle.rleToString.restype = ctypes.c_char_p
    rng = np.random.RandomState(1)
    for _ in range(5):
        h, w = (int(v) for v in rng.randint(5, 50, 2))
        m = (rng.rand(h, w) < 0.3).astype(np.uint8)
        counts = rle.encode_counts(m)
        r = make_ref_rle(oracle, counts, h, w)
        ref_s = oracle.rleToString(ctypes.byref(r))
        assert rle.counts_to_string(counts) == ref_s


def test_frpoly_matches_oracle(oracle):
    rng = np.random.RandomState(2)
    for _ in range(10):
        k = rng.randint(3, 9)
        poly = (rng.rand(k * 2) * 30).astype(np.float64)
        h = w = 35
        r = RefRLE()
        arr = (ctypes.c_double * len(poly))(*poly.tolist())
        oracle.rleFrPoly(ctypes.byref(r), arr, int(k), int(h), int(w))
        got = rle.counts_from_poly(poly, h, w)
        np.testing.assert_array_equal(got, ref_counts(r))


def test_iou_matches_oracle(oracle):
    rng = np.random.RandomState(3)
    h = w = 30
    dts = [(rng.rand(h, w) < 0.4).astype(np.uint8) for _ in range(4)]
    gts = [(rng.rand(h, w) < 0.4).astype(np.uint8) for _ in range(3)]
    rd = [rle.encode(np.asfortranarray(x)) for x in dts]
    rg = [rle.encode(np.asfortranarray(x)) for x in gts]
    for crowd in ([0, 0, 0], [1, 0, 1]):
        got = rle.iou(rd, rg, crowd)
        # oracle
        dt_structs = (RefRLE * 4)(*[
            make_ref_rle(oracle, rle.encode_counts(x), h, w) for x in dts
        ])
        gt_structs = (RefRLE * 3)(*[
            make_ref_rle(oracle, rle.encode_counts(x), h, w) for x in gts
        ])
        out = (ctypes.c_double * 12)()
        crowd_arr = (ctypes.c_ubyte * 3)(*crowd)
        oracle.rleIou(dt_structs, gt_structs, 4, 3, crowd_arr, out)
        ref = np.asarray(out[:12]).reshape(3, 4).T
        np.testing.assert_allclose(got, ref, atol=1e-12)


def test_merge_matches_oracle(oracle):
    rng = np.random.RandomState(4)
    h = w = 20
    a = (rng.rand(h, w) < 0.5).astype(np.uint8)
    b = (rng.rand(h, w) < 0.5).astype(np.uint8)
    ra, rb = rle.encode_counts(a), rle.encode_counts(b)
    for intersect in (0, 1):
        structs = (RefRLE * 2)(
            make_ref_rle(oracle, ra, h, w), make_ref_rle(oracle, rb, h, w)
        )
        out = RefRLE()
        oracle.rleMerge(structs, ctypes.byref(out), 2, intersect)
        got = rle.merge(
            [rle.encode(np.asfortranarray(a)), rle.encode(np.asfortranarray(b))],
            intersect=bool(intersect),
        )
        np.testing.assert_array_equal(
            rle.string_to_counts(got["counts"]), ref_counts(out)
        )


def test_nms_matches_oracle(oracle):
    rng = np.random.RandomState(5)
    h = w = 24
    # overlapping blobs so suppression actually fires at thr=0.3
    masks = []
    for _ in range(6):
        y, x = rng.randint(0, h - 10), rng.randint(0, w - 10)
        m = np.zeros((h, w), np.uint8)
        m[y:y + 10 + rng.randint(-3, 3), x:x + 10 + rng.randint(-3, 3)] = 1
        masks.append(m)
    rds = [rle.encode(np.asfortranarray(m)) for m in masks]
    for thr in (0.1, 0.3, 0.7):
        got = rle.nms(rds, thr)
        structs = (RefRLE * 6)(*[
            make_ref_rle(oracle, rle.encode_counts(m), h, w) for m in masks
        ])
        keep = (ctypes.c_uint * 6)()
        oracle.rleNms(structs, 6, keep, ctypes.c_double(thr))
        np.testing.assert_array_equal(np.asarray(got, int), np.asarray(keep[:6], int))


def test_nms_fallback_matches_native():
    rng = np.random.RandomState(6)
    h = w = 16
    masks = [(rng.rand(h, w) < 0.45).astype(np.uint8) for _ in range(5)]
    rds = [rle.encode(np.asfortranarray(m)) for m in masks]
    native = rle.nms(rds, 0.2)
    lib, checked = rle._lib, rle._lib_checked
    try:
        rle._lib, rle._lib_checked = None, True
        fallback = rle.nms(rds, 0.2)
    finally:
        rle._lib, rle._lib_checked = lib, checked
    np.testing.assert_array_equal(native, fallback)
