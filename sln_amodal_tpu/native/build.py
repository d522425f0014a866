"""Build + load the native RLE library (lazy, cached by mtime)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rle.cpp")
_LIB = os.path.join(_DIR, "librle.so")
_lock = threading.Lock()
_cached: Optional[ctypes.CDLL] = None


def _needs_build() -> bool:
    if not os.path.exists(_LIB):
        return True
    return os.path.getmtime(_SRC) > os.path.getmtime(_LIB)


def build() -> str:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
        check=True,
        capture_output=True,
    )
    return _LIB


def load_library() -> Optional[ctypes.CDLL]:
    """Compile (if needed) and load librle.so; None if no toolchain."""
    global _cached
    with _lock:
        if _cached is not None:
            return _cached
        try:
            if _needs_build():
                build()
            lib = ctypes.CDLL(_LIB)
        except (OSError, subprocess.CalledProcessError, FileNotFoundError):
            return None

        try:
            _bind(lib)
        except AttributeError:
            # stale librle.so from an older source revision: the mtime check
            # passed but a newly added symbol is missing. Fall back to the
            # pure-Python implementations (the designed degradation) rather
            # than crash; a rebuild happens naturally once rle.cpp's mtime
            # advances. (No in-process rebuild: re-dlopening a path whose
            # inode was truncated while mapped is unsafe.)
            return None

        _cached = lib
        return lib


def _bind(lib: ctypes.CDLL) -> None:
    """Declare restype/argtypes for every exported symbol (raises
    AttributeError if the loaded library predates a symbol)."""
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    dp = ctypes.POINTER(ctypes.c_double)

    lib.sln_rle_encode.restype = ctypes.c_int
    lib.sln_rle_encode.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u32p]
    lib.sln_rle_encode_pasted.restype = ctypes.c_int
    lib.sln_rle_encode_pasted.argtypes = [u8p] + [ctypes.c_int] * 6 + [u32p]
    lib.sln_rle_decode.restype = None
    lib.sln_rle_decode.argtypes = [u32p, ctypes.c_int, u8p, ctypes.c_long]
    lib.sln_rle_area.restype = ctypes.c_long
    lib.sln_rle_area.argtypes = [u32p, ctypes.c_int]
    lib.sln_rle_merge.restype = ctypes.c_int
    lib.sln_rle_merge.argtypes = [u32p, i32p, ctypes.c_int, ctypes.c_int, u32p]
    lib.sln_rle_to_bbox.restype = None
    lib.sln_rle_to_bbox.argtypes = [u32p, i32p, ctypes.c_int, ctypes.c_int, dp]
    lib.sln_bb_iou.restype = None
    lib.sln_bb_iou.argtypes = [dp, dp, ctypes.c_int, ctypes.c_int, u8p, dp]
    lib.sln_rle_iou.restype = None
    lib.sln_rle_iou.argtypes = [
        u32p, i32p, ctypes.c_int, u32p, i32p, ctypes.c_int,
        ctypes.c_int, u8p, dp,
    ]
    lib.sln_rle_nms.restype = None
    lib.sln_rle_nms.argtypes = [
        u32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_double, u8p,
    ]
    lib.sln_rle_from_poly.restype = ctypes.c_int
    lib.sln_rle_from_poly.argtypes = [dp, ctypes.c_int, ctypes.c_int, ctypes.c_int, u32p, ctypes.c_int]
    lib.sln_rle_to_string.restype = ctypes.c_int
    lib.sln_rle_to_string.argtypes = [u32p, ctypes.c_int, ctypes.c_char_p]
    lib.sln_rle_from_string.restype = ctypes.c_int
    lib.sln_rle_from_string.argtypes = [ctypes.c_char_p, u32p]
