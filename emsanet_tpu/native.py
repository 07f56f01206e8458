"""ctypes bindings for the native host-side preprocessing library.

Loads `native/libemsanet_native.so` (building it on first use if a
compiler is available); every entry point has a NumPy fallback in
`emsanet_tpu.preprocessing.transforms`, so the framework works without a
toolchain. See native/emsanet_native.cpp for rationale.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libemsanet_native.so")


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "emsanet_native.cpp")
    if not os.path.isfile(src):
        return False
    obj = _SO_PATH + ".o"
    try:
        # compile with fast-math, but LINK without it: -ffast-math at link
        # time pulls in crtfastmath.o, which sets FTZ/DAZ process-wide on
        # dlopen and silently changes the host's (and JAX-CPU's) float
        # semantics for subnormals
        subprocess.run(
            ["g++", "-O3", "-march=native", "-ffast-math", "-fPIC",
             "-c", "-o", obj, src],
            check=True, capture_output=True, timeout=120,
        )
        subprocess.run(
            ["g++", "-shared", "-o", _SO_PATH, obj],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False
    finally:
        if os.path.isfile(obj):
            os.unlink(obj)


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("EMSANET_TPU_NO_NATIVE"):
        return None
    src = os.path.join(_NATIVE_DIR, "emsanet_native.cpp")
    stale = (
        not os.path.isfile(_SO_PATH)
        or (os.path.isfile(src)
            and os.path.getmtime(src) > os.path.getmtime(_SO_PATH))
    )
    if stale and not _build() and not os.path.isfile(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    c_f32p = ctypes.POINTER(ctypes.c_float)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)

    lib.instance_targets.argtypes = [
        c_i32p, c_i32p, c_u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int, c_f32p, c_f32p, c_u8p, c_u8p,
    ]
    lib.resize_nearest_i32.argtypes = [
        c_i32p, ctypes.c_int, ctypes.c_int, c_i32p, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.resize_bilinear_f32.argtypes = [
        c_f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, c_f32p,
        ctypes.c_int, ctypes.c_int,
    ]
    if hasattr(lib, "resize_bilinear_u8"):
        lib.resize_bilinear_u8.argtypes = [
            c_u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, c_u8p,
            ctypes.c_int, ctypes.c_int,
        ]
    lib.normalize_rgb_u8.argtypes = [
        c_u8p, ctypes.c_int64, c_f32p, c_f32p, c_f32p,
    ]
    lib.normalize_depth_f32.argtypes = [
        c_f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, c_f32p,
    ]
    if hasattr(lib, "hsv_jitter_u8"):  # absent in a stale prebuilt .so
        lib.hsv_jitter_u8.argtypes = [
            c_u8p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, c_u8p,
        ]
    _LIB = lib
    return _LIB


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def instance_targets(
    semantic: np.ndarray,
    instance: np.ndarray,
    is_thing: np.ndarray,
    sigma: float,
    normalized_offset: bool,
):
    """Native center/offset/foreground targets; None if lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    h, w = instance.shape
    semantic = np.ascontiguousarray(semantic, np.int32)
    instance = np.ascontiguousarray(instance, np.int32)
    is_thing_u8 = np.ascontiguousarray(is_thing, np.uint8)
    center = np.empty((h, w), np.float32)
    offset = np.empty((h, w, 2), np.float32)
    foreground = np.empty((h, w), np.uint8)
    center_mask = np.empty((h, w), np.uint8)
    lib.instance_targets(
        _ptr(semantic, ctypes.c_int32), _ptr(instance, ctypes.c_int32),
        _ptr(is_thing_u8, ctypes.c_uint8), len(is_thing_u8), h, w,
        float(sigma), int(normalized_offset),
        _ptr(center, ctypes.c_float), _ptr(offset, ctypes.c_float),
        _ptr(foreground, ctypes.c_uint8), _ptr(center_mask, ctypes.c_uint8),
    )
    return {
        "instance_center": center[..., None],
        "instance_offset": offset,
        "instance_foreground": foreground.astype(bool),
        "instance_center_mask": center_mask.astype(bool),
    }


def resize_nearest_i32(src: np.ndarray, oh: int, ow: int):
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int32)
    ih, iw = src.shape
    dst = np.empty((oh, ow), np.int32)
    lib.resize_nearest_i32(
        _ptr(src, ctypes.c_int32), ih, iw, _ptr(dst, ctypes.c_int32), oh, ow
    )
    return dst


def resize_bilinear_f32(src: np.ndarray, oh: int, ow: int):
    lib = get_lib()
    if lib is None:
        return None
    squeeze = src.ndim == 2
    if squeeze:
        src = src[..., None]
    src = np.ascontiguousarray(src, np.float32)
    ih, iw, c = src.shape
    dst = np.empty((oh, ow, c), np.float32)
    lib.resize_bilinear_f32(
        _ptr(src, ctypes.c_float), ih, iw, c, _ptr(dst, ctypes.c_float),
        oh, ow,
    )
    return dst[..., 0] if squeeze else dst


def resize_bilinear_u8(src: np.ndarray, oh: int, ow: int):
    """uint8 bilinear resize with np.round semantics; None if unavailable.

    One native pass instead of astype(f32) -> resize -> np.round ->
    astype(u8) (~80% of a train-preproc sample on one core).
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "resize_bilinear_u8"):
        return None
    squeeze = src.ndim == 2
    if squeeze:
        src = src[..., None]
    src = np.ascontiguousarray(src, np.uint8)
    ih, iw, c = src.shape
    dst = np.empty((oh, ow, c), np.uint8)
    lib.resize_bilinear_u8(
        _ptr(src, ctypes.c_uint8), ih, iw, c, _ptr(dst, ctypes.c_uint8),
        oh, ow,
    )
    return dst[..., 0] if squeeze else dst


def normalize_rgb(rgb_u8: np.ndarray, mean: np.ndarray, std: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    rgb_u8 = np.ascontiguousarray(rgb_u8, np.uint8)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty(rgb_u8.shape, np.float32)
    lib.normalize_rgb_u8(
        _ptr(rgb_u8, ctypes.c_uint8), rgb_u8.shape[0] * rgb_u8.shape[1],
        _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
        _ptr(out, ctypes.c_float),
    )
    return out


def normalize_depth(depth: np.ndarray, mean: float, std: float,
                    raw_depth: bool):
    lib = get_lib()
    if lib is None:
        return None
    depth = np.ascontiguousarray(depth, np.float32)
    out = np.empty(depth.shape, np.float32)
    lib.normalize_depth_f32(
        _ptr(depth, ctypes.c_float), depth.size, float(mean), float(std),
        int(raw_depth), _ptr(out, ctypes.c_float),
    )
    return out


def hsv_jitter(rgb_u8: np.ndarray, dh: float, ds: float, dv: float):
    """HSV jitter on (h, w, 3) uint8 RGB; None if lib unavailable.

    dh/ds/dv are the pre-drawn uniform jitters (the RNG stays in Python so
    the augmentation stream is identical with or without the native lib).
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "hsv_jitter_u8"):
        return None
    rgb_u8 = np.ascontiguousarray(rgb_u8, np.uint8)
    out = np.empty(rgb_u8.shape, np.uint8)
    lib.hsv_jitter_u8(
        _ptr(rgb_u8, ctypes.c_uint8), rgb_u8.shape[0] * rgb_u8.shape[1],
        float(dh), float(ds), float(dv), _ptr(out, ctypes.c_uint8),
    )
    return out
