"""COCO-compatible RLE mask API (pycocotools.mask replacement).

Thin Python layer over the native C++ library
(``sln_amodal_tpu/native/rle.cpp``), with a pure-numpy fallback when no
toolchain is available. The on-disk/JSON format is the standard COCO one:
``{'size': [h, w], 'counts': bytes}`` with the 6-bit LEB128-style string
codec; masks are Fortran-order (column-major), runs alternate 0s/1s starting
with zeros.

Evaluation IoU is RLE-space (run-zipper), exactly like the reference's
vendored ``cocoapi`` library the evaluator depends on.
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from ..native.build import load_library

RLEDict = Dict[str, object]

_lib = None
_lib_checked = False


def _native():
    global _lib, _lib_checked
    if not _lib_checked:
        _lib = load_library()
        _lib_checked = True
    return _lib


def _u32(arr) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(arr, dtype=np.uint32))


def _as_ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


# ------------------------------------------------------------- raw counts ---

def encode_counts(mask_f: np.ndarray) -> np.ndarray:
    """Column-major uint8 [h, w] mask → uint32 run counts."""
    h, w = mask_f.shape
    flat = np.asarray(mask_f, dtype=np.uint8, order="F").reshape(-1, order="F")
    lib = _native()
    if lib is not None:
        out = np.empty(h * w + 1, np.uint32)
        m = lib.sln_rle_encode(
            _as_ptr(np.ascontiguousarray(flat), ctypes.c_uint8), h, w,
            _as_ptr(out, ctypes.c_uint32),
        )
        return out[:m].copy()
    # numpy fallback
    if flat.size == 0:
        return np.zeros(1, np.uint32)
    changes = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    bounds = np.concatenate([[0], changes, [flat.size]])
    counts = np.diff(bounds)
    if flat[0] != 0:
        counts = np.concatenate([[0], counts])
    return counts.astype(np.uint32)


def encode_pasted_counts(crop: np.ndarray, y1: int, x1: int,
                         H: int, W: int) -> np.ndarray:
    """Run counts of an [H, W] frame equal to the binary row-major ``crop``
    pasted at (y1, x1) into zeros — without materializing the frame
    (O(box area) instead of O(frame area); bit-identical to
    ``encode_counts`` of the pasted frame)."""
    crop = np.ascontiguousarray(crop, np.uint8)
    h, w = crop.shape
    assert 0 <= y1 and 0 <= x1 and y1 + h <= H and x1 + w <= W, \
        (y1, x1, h, w, H, W)
    lib = _native()
    if lib is not None:
        # per frame column: <= h crop runs + 2 zero pads; +2 outer, +1 final
        out = np.empty(w * (h + 2) + 3, np.uint32)
        m = lib.sln_rle_encode_pasted(
            _as_ptr(crop, ctypes.c_uint8), h, w, int(y1), int(x1),
            int(H), int(W), _as_ptr(out, ctypes.c_uint32),
        )
        return out[:m].copy()
    full = np.zeros((H, W), np.uint8)
    full[y1:y1 + h, x1:x1 + w] = crop
    return encode_counts(full)


def decode_counts(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    """Run counts → column-major uint8 [h, w] mask."""
    counts = _u32(counts)
    lib = _native()
    size = h * w
    if lib is not None:
        out = np.empty(size, np.uint8)
        lib.sln_rle_decode(
            _as_ptr(counts, ctypes.c_uint32), len(counts),
            _as_ptr(out, ctypes.c_uint8), size,
        )
    else:
        vals = np.arange(len(counts)) % 2
        out = np.repeat(vals.astype(np.uint8), counts)
        if out.size < size:
            out = np.concatenate([out, np.zeros(size - out.size, np.uint8)])
        out = out[:size]
    return out.reshape((h, w), order="F")


def counts_to_string(counts: np.ndarray) -> bytes:
    counts = _u32(counts)
    lib = _native()
    if lib is not None:
        buf = ctypes.create_string_buffer(6 * max(len(counts), 1) + 1)
        n = lib.sln_rle_to_string(_as_ptr(counts, ctypes.c_uint32), len(counts), buf)
        return buf.raw[:n]
    # python fallback
    s = bytearray()
    for i in range(len(counts)):
        x = int(counts[i])
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            s.append(c + 48)
    return bytes(s)


def string_to_counts(s: Union[str, bytes]) -> np.ndarray:
    if isinstance(s, str):
        s = s.encode()
    lib = _native()
    if lib is not None:
        out = np.empty(len(s) + 1, np.uint32)
        m = lib.sln_rle_from_string(s, _as_ptr(out, ctypes.c_uint32))
        return out[:m].copy()
    counts: List[int] = []
    p = 0
    while p < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[p] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.uint32)


def counts_from_poly(xy: Sequence[float], h: int, w: int) -> np.ndarray:
    xy = np.ascontiguousarray(np.asarray(xy, np.float64).reshape(-1))
    k = len(xy) // 2
    lib = _native()
    if lib is not None:
        cap = h * w + 8 * k + 16
        out = np.empty(cap, np.uint32)
        m = lib.sln_rle_from_poly(
            _as_ptr(xy, ctypes.c_double), k, h, w,
            _as_ptr(out, ctypes.c_uint32), cap,
        )
        if m < 0:  # crossing count exceeded the heuristic bound — retry exact
            cap = -m
            out = np.empty(cap, np.uint32)
            m = lib.sln_rle_from_poly(
                _as_ptr(xy, ctypes.c_double), k, h, w,
                _as_ptr(out, ctypes.c_uint32), cap,
            )
        return out[:m].copy()
    return _poly_fallback(xy, k, h, w)


def _poly_fallback(xy: np.ndarray, k: int, h: int, w: int) -> np.ndarray:
    """Pure-python COCO polygon rasterization (same convention as native)."""
    scale = 5.0
    px = [int(scale * xy[2 * j] + 0.5) for j in range(k)] + [int(scale * xy[0] + 0.5)]
    py = [int(scale * xy[2 * j + 1] + 0.5) for j in range(k)] + [int(scale * xy[1] + 0.5)]
    u: List[int] = []
    v: List[int] = []
    for j in range(k):
        xs, xe, ys, ye = px[j], px[j + 1], py[j], py[j + 1]
        dx, dy = abs(xe - xs), abs(ys - ye)
        flip = (dx >= dy and xs > xe) or (dx < dy and ys > ye)
        if flip:
            xs, xe, ys, ye = xe, xs, ye, ys
        if dx >= dy:
            s = (ye - ys) / dx if dx else 0.0
            for d in range(dx + 1):
                t = dx - d if flip else d
                u.append(t + xs)
                v.append(int(ys + s * t + 0.5))
        else:
            s = (xe - xs) / dy if dy else 0.0
            for d in range(dy + 1):
                t = dy - d if flip else d
                v.append(t + ys)
                u.append(int(xs + s * t + 0.5))
    a: List[int] = []
    for j in range(1, len(u)):
        if u[j] == u[j - 1]:
            continue
        xd = float(u[j] if u[j] < u[j - 1] else u[j] - 1)
        xd = (xd + 0.5) / scale - 0.5
        if np.floor(xd) != xd or xd < 0 or xd > w - 1:
            continue
        yd = float(v[j] if v[j] < v[j - 1] else v[j - 1])
        yd = (yd + 0.5) / scale - 0.5
        yd = min(max(yd, 0), h)
        a.append(int(xd) * h + int(np.ceil(yd)))
    a.append(h * w)
    a.sort()
    deltas = []
    p = 0
    for t in a:
        deltas.append(t - p)
        p = t
    b = [deltas[0]]
    j = 1
    while j < len(deltas):
        if deltas[j] > 0:
            b.append(deltas[j])
            j += 1
        else:
            j += 1
            if j < len(deltas):
                b[-1] += deltas[j]
                j += 1
    return np.asarray(b, np.uint32)


# ----------------------------------------------------------- dict-level API --

def _to_counts(rle: RLEDict) -> np.ndarray:
    c = rle["counts"]
    if isinstance(c, (bytes, str)):
        return string_to_counts(c)
    return _u32(c)


def encode(mask: np.ndarray) -> Union[RLEDict, List[RLEDict]]:
    """uint8 Fortran-order [H,W] or [H,W,N] → RLE dict(s) with string counts."""
    if mask.ndim == 3:
        return [encode(mask[:, :, i]) for i in range(mask.shape[2])]
    h, w = mask.shape
    counts = encode_counts(mask)
    return {"size": [int(h), int(w)], "counts": counts_to_string(counts)}


def encode_pasted(crop: np.ndarray, y1: int, x1: int, H: int, W: int) -> RLEDict:
    """RLE dict of ``crop`` pasted at (y1, x1) into an [H, W] zero frame
    (see ``encode_pasted_counts``)."""
    return {
        "size": [int(H), int(W)],
        "counts": counts_to_string(encode_pasted_counts(crop, y1, x1, H, W)),
    }


def decode(rle: Union[RLEDict, List[RLEDict]]) -> np.ndarray:
    if isinstance(rle, list):
        if not rle:
            return np.zeros((0, 0, 0), np.uint8)
        return np.stack([decode(r) for r in rle], axis=2)
    h, w = rle["size"]
    return decode_counts(_to_counts(rle), int(h), int(w))


def area(rle: Union[RLEDict, List[RLEDict]]):
    if isinstance(rle, list):
        return np.asarray([area(r) for r in rle], np.uint32)
    counts = _to_counts(rle)
    lib = _native()
    if lib is not None:
        return int(lib.sln_rle_area(_as_ptr(counts, ctypes.c_uint32), len(counts)))
    return int(counts[1::2].sum())


def merge(rles: List[RLEDict], intersect: bool = False) -> RLEDict:
    if not rles:
        return {"size": [0, 0], "counts": b""}
    h, w = rles[0]["size"]
    counts_list = [_to_counts(r) for r in rles]
    lib = _native()
    if lib is not None:
        cat = np.concatenate(counts_list).astype(np.uint32)
        ms = np.asarray([len(c) for c in counts_list], np.int32)
        out = np.empty(h * w + 2, np.uint32)
        m = lib.sln_rle_merge(
            _as_ptr(np.ascontiguousarray(cat), ctypes.c_uint32),
            _as_ptr(ms, ctypes.c_int32), len(counts_list), int(intersect),
            _as_ptr(out, ctypes.c_uint32),
        )
        counts = out[:m]
    else:
        acc = decode_counts(counts_list[0], h, w).astype(bool)
        for c in counts_list[1:]:
            m2 = decode_counts(c, h, w).astype(bool)
            acc = (acc & m2) if intersect else (acc | m2)
        counts = encode_counts(acc.astype(np.uint8))
    return {"size": [int(h), int(w)], "counts": counts_to_string(counts)}


def toBbox(rle: Union[RLEDict, List[RLEDict]]) -> np.ndarray:
    single = not isinstance(rle, list)
    rles = [rle] if single else rle
    lib = _native()
    if lib is not None and rles:
        counts_list = [_to_counts(r) for r in rles]
        cat = np.ascontiguousarray(np.concatenate(counts_list).astype(np.uint32))
        ms = np.asarray([len(c) for c in counts_list], np.int32)
        bb = np.empty((len(rles), 4), np.float64)
        lib.sln_rle_to_bbox(
            _as_ptr(cat, ctypes.c_uint32), _as_ptr(ms, ctypes.c_int32),
            len(rles), int(rles[0]["size"][0]), _as_ptr(bb, ctypes.c_double),
        )
        return bb[0] if single else bb
    # fallback via decode
    out = []
    for r in rles:
        m = decode(r)
        ys, xs = np.nonzero(m)
        if len(xs) == 0:
            out.append([0, 0, 0, 0])
        else:
            out.append([xs.min(), ys.min(), xs.max() - xs.min() + 1, ys.max() - ys.min() + 1])
    bb = np.asarray(out, np.float64)
    return bb[0] if single else bb


def _is_box_array(objs) -> bool:
    return isinstance(objs, np.ndarray) or (
        len(objs) > 0 and isinstance(objs[0], (list, tuple, np.ndarray))
        and len(objs[0]) == 4 and not isinstance(objs[0], dict)
    )


def iou(dt, gt, iscrowd) -> np.ndarray:
    """IoU matrix [len(dt), len(gt)] — pycocotools.mask.iou contract
    (RLE dicts or xywh box arrays)."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    iscrowd_arr = np.asarray(
        [int(c) for c in iscrowd] if len(iscrowd) else [0] * len(gt), np.uint8
    )
    if _is_box_array(dt) and _is_box_array(gt):
        dtb = np.ascontiguousarray(np.asarray(dt, np.float64))
        gtb = np.ascontiguousarray(np.asarray(gt, np.float64))
        lib = _native()
        out = np.empty((len(gt), len(dt)), np.float64)
        if lib is not None:
            lib.sln_bb_iou(
                _as_ptr(dtb, ctypes.c_double), _as_ptr(gtb, ctypes.c_double),
                len(dt), len(gt), _as_ptr(iscrowd_arr, ctypes.c_uint8),
                _as_ptr(out, ctypes.c_double),
            )
        else:
            for g in range(len(gt)):
                for d in range(len(dt)):
                    out[g, d] = _bb_iou_one(dtb[d], gtb[g], iscrowd_arr[g])
        return out.T

    dts = [_to_counts(r) for r in dt]
    gts = [_to_counts(r) for r in gt]
    h = int(dt[0]["size"][0])
    lib = _native()
    out = np.empty((len(gt), len(dt)), np.float64)
    if lib is not None:
        dcat = np.ascontiguousarray(np.concatenate(dts).astype(np.uint32))
        gcat = np.ascontiguousarray(np.concatenate(gts).astype(np.uint32))
        dms = np.asarray([len(c) for c in dts], np.int32)
        gms = np.asarray([len(c) for c in gts], np.int32)
        lib.sln_rle_iou(
            _as_ptr(dcat, ctypes.c_uint32), _as_ptr(dms, ctypes.c_int32), len(dt),
            _as_ptr(gcat, ctypes.c_uint32), _as_ptr(gms, ctypes.c_int32), len(gt),
            h, _as_ptr(iscrowd_arr, ctypes.c_uint8), _as_ptr(out, ctypes.c_double),
        )
    else:
        dms_ = [decode(r).astype(bool) for r in dt]
        gms_ = [decode(r).astype(bool) for r in gt]
        for g in range(len(gt)):
            for d in range(len(dt)):
                inter = np.logical_and(dms_[d], gms_[g]).sum()
                if iscrowd_arr[g]:
                    union = dms_[d].sum()
                else:
                    union = np.logical_or(dms_[d], gms_[g]).sum()
                out[g, d] = inter / union if union else 0.0
    return out.T


def nms(dt: List[RLEDict], thr: float) -> np.ndarray:
    """Greedy mask NMS — pycocotools ``mask.nms`` contract
    (``maskApi.c:99-107``, dormant in the reference's live path; provided for
    API completeness). Returns uint8 keep flags in the given order."""
    n = len(dt)
    if n == 0:
        return np.zeros(0, np.uint8)
    lib = _native()
    if lib is not None:
        counts = [_to_counts(r) for r in dt]
        cat = np.ascontiguousarray(np.concatenate(counts).astype(np.uint32))
        ms = np.asarray([len(c) for c in counts], np.int32)
        h = int(dt[0]["size"][0])
        keep = np.empty(n, np.uint8)
        lib.sln_rle_nms(
            _as_ptr(cat, ctypes.c_uint32), _as_ptr(ms, ctypes.c_int32), n, h,
            ctypes.c_double(thr), _as_ptr(keep, ctypes.c_uint8),
        )
        return keep
    keep = np.ones(n, np.uint8)
    for i in range(n):
        if not keep[i]:
            continue
        for j in range(i + 1, n):
            if keep[j] and float(iou([dt[i]], [dt[j]], [0])[0, 0]) > thr:
                keep[j] = 0
    return keep


def _bb_iou_one(d, g, crowd):
    da, ga = d[2] * d[3], g[2] * g[3]
    w = min(d[2] + d[0], g[2] + g[0]) - max(d[0], g[0])
    if w <= 0:
        return 0.0
    h = min(d[3] + d[1], g[3] + g[1]) - max(d[1], g[1])
    if h <= 0:
        return 0.0
    i = w * h
    u = da if crowd else da + ga - i
    return i / u


def frPyObjects(pyobj, h: int, w: int):
    """Polygons / uncompressed RLE / bbox → RLE dict(s) — pycocotools
    ``frPyObjects`` contract."""
    if isinstance(pyobj, np.ndarray) and pyobj.ndim == 2:
        return [frPyObjects(row, h, w) for row in pyobj.tolist()]
    if isinstance(pyobj, list) and len(pyobj) and isinstance(pyobj[0], (list, tuple, np.ndarray)):
        return [frPyObjects(p, h, w) for p in pyobj]
    if isinstance(pyobj, list) and len(pyobj) and isinstance(pyobj[0], dict):
        return [frPyObjects(p, h, w) for p in pyobj]
    if isinstance(pyobj, dict):
        counts = pyobj["counts"]
        if isinstance(counts, list):
            return {
                "size": [h, w],
                "counts": counts_to_string(_u32(counts)),
            }
        return {"size": pyobj.get("size", [h, w]), "counts": counts}
    arr = np.asarray(pyobj, np.float64).reshape(-1)
    if len(arr) == 4:  # xywh bbox
        x, y, bw, bh = arr
        poly = [x, y, x, y + bh, x + bw, y + bh, x + bw, y]
        return {"size": [h, w], "counts": counts_to_string(counts_from_poly(poly, h, w))}
    counts = counts_from_poly(arr, h, w)
    return {"size": [h, w], "counts": counts_to_string(counts)}
