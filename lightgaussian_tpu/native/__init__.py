"""Native host runtime: ctypes bindings over `src/lg_native.cpp`.

Covers the host hot paths the reference keeps in native code (see the .cpp
header): COLMAP binary parsing, 3-NN mean squared distance for scale init
(`simple_knn` equivalent), and VecTree bit packing. The library is compiled
on first use with g++ (cached next to the source, rebuilt when the source is
newer); every entry point has a pure-Python/numpy fallback, so the package
works even without a toolchain — `available()` tells you which path is live.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "src" / "lg_native.cpp"
_LIB = Path(__file__).parent / "_lg_native.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        str(_SRC), "-o", str(_LIB),
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if proc.returncode != 0:
        print(f"[native] build failed:\n{proc.stderr[-2000:]}")
        return False
    return True


def load() -> ctypes.CDLL | None:
    """Compile (if needed) and load the native library; None on failure."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if os.environ.get("LG_DISABLE_NATIVE"):
            _load_failed = True
            return None
        try:
            if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
                if not _build():
                    _load_failed = True
                    return None
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            _load_failed = True
            return None

        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
        u64 = ctypes.c_uint64
        u64p = ctypes.POINTER(u64)

        lib.lg_images_bin_sizes.argtypes = [u8p, u64, u64p, u64p, u64p]
        lib.lg_images_bin_sizes.restype = ctypes.c_int
        lib.lg_parse_images_bin.argtypes = [u8p, u64, i64p, f64p, u8p, f64p, i64p]
        lib.lg_parse_images_bin.restype = ctypes.c_int
        lib.lg_points3d_bin_count.argtypes = [u8p, u64, u64p]
        lib.lg_points3d_bin_count.restype = ctypes.c_int
        lib.lg_parse_points3d_bin.argtypes = [u8p, u64, f64p, u8p, f64p]
        lib.lg_parse_points3d_bin.restype = ctypes.c_int
        lib.lg_knn3_mean_sq_dist.argtypes = [f32p, u64, ctypes.c_int, f32p]
        lib.lg_knn3_mean_sq_dist.restype = ctypes.c_int
        lib.lg_pack_bits_msb.argtypes = [u32p, u64, ctypes.c_int, u8p, u64]
        lib.lg_pack_bits_msb.restype = ctypes.c_int
        lib.lg_unpack_bits_msb.argtypes = [u8p, u64, u64, ctypes.c_int, u32p]
        lib.lg_unpack_bits_msb.restype = ctypes.c_int
        _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


# ---------------------------------------------------------------------------
# Wrappers (None return = use the Python fallback)
# ---------------------------------------------------------------------------

def parse_images_bin(path) -> list[tuple] | None:
    """-> [(image_id, qvec[4], tvec[3], camera_id, name, xys[M,2], ids[M])]"""
    lib = load()
    if lib is None:
        return None
    buf = np.fromfile(path, np.uint8)
    n = ctypes.c_uint64()
    pts = ctypes.c_uint64()
    name_bytes = ctypes.c_uint64()
    if lib.lg_images_bin_sizes(buf, buf.size, ctypes.byref(n),
                               ctypes.byref(pts), ctypes.byref(name_bytes)):
        return None
    meta = np.empty((n.value, 4), np.int64)
    qt = np.empty((n.value, 7), np.float64)
    names = np.empty(max(1, name_bytes.value), np.uint8)
    xys = np.empty((pts.value, 2), np.float64)
    ids = np.empty(pts.value, np.int64)
    if lib.lg_parse_images_bin(buf, buf.size, meta, qt, names, xys, ids):
        return None
    out = []
    pt_off = 0
    raw_names = names.tobytes()
    for i in range(n.value):
        image_id, camera_id, n_pts, name_off = meta[i]
        name = raw_names[name_off:raw_names.index(b"\x00", name_off)].decode("utf-8")
        out.append((
            int(image_id), qt[i, :4].copy(), qt[i, 4:].copy(), int(camera_id),
            name, xys[pt_off:pt_off + n_pts].copy(), ids[pt_off:pt_off + n_pts].copy(),
        ))
        pt_off += int(n_pts)
    return out


def parse_points3d_bin(path) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """-> (xyz [N,3] f64, rgb [N,3] u8, err [N,1] f64)"""
    lib = load()
    if lib is None:
        return None
    buf = np.fromfile(path, np.uint8)
    n = ctypes.c_uint64()
    if lib.lg_points3d_bin_count(buf, buf.size, ctypes.byref(n)):
        return None
    xyz = np.empty((n.value, 3), np.float64)
    rgb = np.empty((n.value, 3), np.uint8)
    err = np.empty((n.value, 1), np.float64)
    if lib.lg_parse_points3d_bin(buf, buf.size, xyz, rgb, err):
        return None
    return xyz, rgb, err


def knn3_mean_sq_dist(points: np.ndarray, window: int = 24) -> np.ndarray | None:
    """Mean squared distance to 3 nearest neighbors (Morton-windowed)."""
    lib = load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(pts.shape[0], np.float32)
    if lib.lg_knn3_mean_sq_dist(pts, pts.shape[0], window, out):
        return None
    return out


def pack_bits_msb(values: np.ndarray, bits: int) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    vals = np.ascontiguousarray(values, np.uint32)
    out = np.empty((vals.size * bits + 7) // 8, np.uint8)
    if lib.lg_pack_bits_msb(vals, vals.size, bits, out, out.size):
        return None
    return out


def unpack_bits_msb(packed: np.ndarray, count: int, bits: int) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    buf = np.ascontiguousarray(packed, np.uint8)
    out = np.empty(count, np.uint32)
    if lib.lg_unpack_bits_msb(buf, buf.size, count, bits, out):
        return None
    return out
