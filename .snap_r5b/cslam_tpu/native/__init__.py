"""ctypes loader for the native (C++) host components.

The reference's latency-sensitive host work lives in C++ (rtabmap feature
extraction, src/front_end/rgbd_handler.cpp:266-312); ours does too:
``native/features.cpp`` provides FAST-9 detection, BRIEF-256 description and
mutual hamming matching behind a plain C ABI. The library is compiled on
first import (one ``g++ -O3 -shared`` invocation, cached); if no compiler is
available, ``available()`` returns False and callers fall back to the slower
pure-NumPy implementations in ``cslam_tpu.native.fallback``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcslam_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "features.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_NATIVE_DIR, "features.cpp")
    stale = (os.path.exists(_LIB_PATH) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
    if (not os.path.exists(_LIB_PATH) or stale) and not _build():
        if not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    # an outdated .so kept after a failed rebuild may lack newer symbols;
    # degrade to the numpy fallback rather than crashing at bind time
    try:
        lib.cslam_steered_brief_describe
    except AttributeError:
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.cslam_fast_detect.restype = ctypes.c_int
    lib.cslam_fast_detect.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, i32p, i32p]
    lib.cslam_brief_describe.restype = None
    lib.cslam_brief_describe.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int, u8p]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.cslam_steered_brief_describe.restype = None
    lib.cslam_steered_brief_describe.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int, u8p, f32p]
    lib.cslam_hamming_match.restype = ctypes.c_int
    lib.cslam_hamming_match.argtypes = [
        u8p, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, i32p, ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def fast_detect(image: np.ndarray, threshold: int = 25, max_kp: int = 512,
                grid_cells: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """FAST-9 corners: returns (xy [N,2] int32, scores [N] int32)."""
    lib = _load()
    image = np.ascontiguousarray(image, np.uint8)
    if lib is None:
        from cslam_tpu.native import fallback
        return fallback.fast_detect(image, threshold, max_kp)
    h, w = image.shape
    out_xy = np.zeros((max_kp, 2), np.int32)
    out_score = np.zeros(max_kp, np.int32)
    n = lib.cslam_fast_detect(image, h, w, threshold, max_kp, grid_cells,
                              out_xy, out_score)
    return out_xy[:n], out_score[:n]


def brief_describe(image: np.ndarray, kp_xy: np.ndarray) -> np.ndarray:
    """BRIEF-256: (image, [N,2] int32) -> [N, 32] uint8 descriptors."""
    lib = _load()
    image = np.ascontiguousarray(image, np.uint8)
    kp_xy = np.ascontiguousarray(kp_xy, np.int32)
    if lib is None:
        from cslam_tpu.native import fallback
        return fallback.brief_describe(image, kp_xy)
    h, w = image.shape
    out = np.zeros((len(kp_xy), 32), np.uint8)
    if len(kp_xy):
        lib.cslam_brief_describe(image, h, w, kp_xy, len(kp_xy), out)
    return out


def steered_brief_describe(image: np.ndarray, kp_xy: np.ndarray
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """ORB-style steered BRIEF-256: the sampling pattern is rotated by
    each keypoint's intensity-centroid orientation, for in-plane-rotation
    robustness (rtabmap Feature2D's ORB role,
    reference rgbd_handler.cpp:266-312). Returns
    (descriptors [N,32] uint8, angles [N] float32 radians)."""
    lib = _load()
    image = np.ascontiguousarray(image, np.uint8)
    kp_xy = np.ascontiguousarray(kp_xy, np.int32)
    if lib is None:
        from cslam_tpu.native import fallback
        return fallback.steered_brief_describe(image, kp_xy)
    h, w = image.shape
    out = np.zeros((len(kp_xy), 32), np.uint8)
    angles = np.zeros(len(kp_xy), np.float32)
    if len(kp_xy):
        lib.cslam_steered_brief_describe(image, h, w, kp_xy, len(kp_xy),
                                         out, angles)
    return out, angles


def hamming_match(desc_a: np.ndarray, desc_b: np.ndarray,
                  max_dist: int = 64, ratio: float = 0.0) -> np.ndarray:
    """Mutual-NN hamming matches: returns [M, 2] int32 index pairs.
    ``ratio`` > 0 adds a Lowe ratio test (best <= ratio * second-best)."""
    lib = _load()
    desc_a = np.ascontiguousarray(desc_a, np.uint8)
    desc_b = np.ascontiguousarray(desc_b, np.uint8)
    if lib is None:
        from cslam_tpu.native import fallback
        return fallback.hamming_match(desc_a, desc_b, max_dist, ratio)
    max_pairs = min(len(desc_a), len(desc_b))
    out = np.zeros((max(max_pairs, 1), 2), np.int32)
    n = lib.cslam_hamming_match(desc_a, len(desc_a), desc_b, len(desc_b),
                                max_dist, ctypes.c_float(ratio), out,
                                max_pairs)
    return out[:n]
