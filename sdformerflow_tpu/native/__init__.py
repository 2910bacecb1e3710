"""ctypes bindings for the C++ event-stream kernels (event_ops.cpp).

The shared library is compiled on first import with g++ -O3 and cached
under ``~/.cache/sdformerflow_native`` keyed by a source hash; if no
toolchain is available every function transparently falls back to the
numpy implementation, so the native path is an accelerator, never a
dependency.

Replaces the reference's numba-JIT loader internals
(/root/reference/DSEC_dataloader/event_representations.py:174-232) with a
real native component (the task's runtime/data-path code is C++ where the
reference's was native).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(os.path.dirname(__file__), "event_ops.cpp")
    try:
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "sdformerflow_native")
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"event_ops_{digest}.so")
        if not os.path.exists(so_path):
            tmp = so_path + ".tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", tmp, src],
                check=True, capture_output=True)
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        i64 = ctypes.c_int64
        p_i64 = ctypes.POINTER(ctypes.c_int64)
        p_f32 = ctypes.POINTER(ctypes.c_float)
        p_u8 = ctypes.POINTER(ctypes.c_uint8)
        p_u16 = ctypes.POINTER(ctypes.c_uint16)
        lib.lower_bound_i64.restype = i64
        lib.lower_bound_i64.argtypes = [p_i64, i64, i64]
        lib.compute_ms_to_idx.restype = None
        lib.compute_ms_to_idx.argtypes = [p_i64, i64, i64, p_i64]
        lib.slice_windows.restype = None
        lib.slice_windows.argtypes = [p_i64, i64, p_i64, i64, p_i64, p_i64]
        lib.pack_window.restype = None
        lib.pack_window.argtypes = [p_u16, p_u16, p_i64, p_u8, i64, i64,
                                    i64, p_f32, p_f32, p_f32, p_f32, p_u8]
        lib.pack_window_f32.restype = None
        lib.pack_window_f32.argtypes = [p_f32, p_f32, p_f32, p_f32, i64,
                                        ctypes.c_float, i64, p_f32, p_f32,
                                        p_f32, p_f32, p_u8]
        lib.pack_window_sorted.restype = None
        lib.pack_window_sorted.argtypes = [p_u16, p_u16, p_i64, p_u8, i64,
                                           i64, i64, i64, p_f32, p_f32,
                                           p_f32, p_f32, p_u8]
        lib.pack_window_sorted_f32.restype = None
        lib.pack_window_sorted_f32.argtypes = [p_f32, p_f32, p_f32, p_f32,
                                               i64, ctypes.c_float, i64, i64,
                                               p_f32, p_f32, p_f32, p_f32,
                                               p_u8]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def compute_ms_to_idx(t_us: np.ndarray, n_ms: int) -> np.ndarray:
    """ms_to_idx[ms] = first index with t_us >= ms*1000 (reference
    compute_ms_to_idx semantics, event_representations.py:174-198)."""
    t_us = np.ascontiguousarray(t_us, np.int64)
    lib = _build_and_load()
    if lib is None:
        return np.searchsorted(
            t_us, np.arange(n_ms, dtype=np.int64) * 1000,
            side="left").astype(np.int64)
    out = np.empty(n_ms, np.int64)
    lib.compute_ms_to_idx(_ptr(t_us, ctypes.c_int64), t_us.size, n_ms,
                          _ptr(out, ctypes.c_int64))
    return out


def slice_windows(t_us: np.ndarray, bounds_us: np.ndarray):
    """(lo, hi) index pairs for W windows over a sorted stream;
    bounds_us has W+1 entries. O(n + W) single pass natively."""
    t_us = np.ascontiguousarray(t_us, np.int64)
    bounds_us = np.ascontiguousarray(bounds_us, np.int64)
    w = bounds_us.size - 1
    lib = _build_and_load()
    if lib is None:
        idx = np.searchsorted(t_us, bounds_us, side="left")
        return idx[:-1].copy(), idx[1:].copy()
    lo = np.empty(w, np.int64)
    hi = np.empty(w, np.int64)
    lib.slice_windows(_ptr(t_us, ctypes.c_int64), t_us.size,
                      _ptr(bounds_us, ctypes.c_int64), w,
                      _ptr(lo, ctypes.c_int64), _ptr(hi, ctypes.c_int64))
    return lo, hi


def pack_window(x, y, t, p, cap: int, t0=None):
    """Pad/truncate one window's events into fixed-[cap] float32 buffers +
    a uint8 valid mask (the device-buffer layout ops.voxel.pad_events
    produces). Accepts DSEC storage dtypes (u16/u16/i64/u8) or float32."""
    n = len(x)
    ox = np.empty(cap, np.float32)
    oy = np.empty(cap, np.float32)
    ot = np.empty(cap, np.float32)
    op = np.empty(cap, np.float32)
    valid = np.empty(cap, np.uint8)
    lib = _build_and_load()
    if (lib is not None and x.dtype == np.uint16 and y.dtype == np.uint16
            and t.dtype == np.int64 and p.dtype in (np.uint8, np.bool_)):
        t0i = int(t[0]) if (t0 is None and n) else int(t0 or 0)
        lib.pack_window(
            _ptr(np.ascontiguousarray(x), ctypes.c_uint16),
            _ptr(np.ascontiguousarray(y), ctypes.c_uint16),
            _ptr(np.ascontiguousarray(t), ctypes.c_int64),
            _ptr(np.ascontiguousarray(p, np.uint8), ctypes.c_uint8),
            n, t0i, cap,
            _ptr(ox, ctypes.c_float), _ptr(oy, ctypes.c_float),
            _ptr(ot, ctypes.c_float), _ptr(op, ctypes.c_float),
            _ptr(valid, ctypes.c_uint8))
        return ox, oy, ot, op, valid.astype(bool)
    if lib is not None:
        xf = np.ascontiguousarray(x, np.float32)
        yf = np.ascontiguousarray(y, np.float32)
        pf = np.ascontiguousarray(p, np.float32)
        # Rebase t BEFORE narrowing to f32: absolute int64/f64 microsecond
        # stamps (~1e9+) lose microsecond resolution in f32, so subtract t0
        # in f64 first (matches the numpy fallback) and hand the kernel
        # already-rebased times with t0 = 0.
        t64 = np.asarray(t, np.float64)
        off = float(t64[0]) if (t0 is None and n) else float(t0 or 0.0)
        tf = np.ascontiguousarray(t64 - off, np.float32)
        lib.pack_window_f32(
            _ptr(xf, ctypes.c_float), _ptr(yf, ctypes.c_float),
            _ptr(tf, ctypes.c_float), _ptr(pf, ctypes.c_float),
            n, 0.0, cap,
            _ptr(ox, ctypes.c_float), _ptr(oy, ctypes.c_float),
            _ptr(ot, ctypes.c_float), _ptr(op, ctypes.c_float),
            _ptr(valid, ctypes.c_uint8))
        return ox, oy, ot, op, valid.astype(bool)
    # numpy fallback
    m = min(n, cap)
    for buf, src in ((ox, x), (oy, y), (op, p)):
        buf[:m] = np.asarray(src[:m], np.float32)
        buf[m:] = 0
    tt = np.asarray(t[:m], np.float64)
    off = (float(t[0]) if (t0 is None and n) else float(t0 or 0.0))
    ot[:m] = (tt - off).astype(np.float32)
    ot[m:] = 0
    valid[:m] = 1
    valid[m:] = 0
    return ox, oy, ot, op, valid.astype(bool)


def pack_window_sorted(x, y, t, p, cap: int, height: int, t0=None):
    """pack_window variant that emits events grouped by the Pallas
    voxelizer's row key g = clip(trunc(y), -1, height-1) + 1 (stable
    counting sort) and pads the tail with y = height (the last group, zero
    weight). Buffers packed this way feed the voxelizer with
    ``presorted=True`` (ops/pallas_voxel.py), skipping its on-device
    lax.sort — ~55% of the kernel at 2^20 events (PERF_NOTES.md)."""
    n = len(x)
    ox = np.empty(cap, np.float32)
    oy = np.empty(cap, np.float32)
    ot = np.empty(cap, np.float32)
    op = np.empty(cap, np.float32)
    valid = np.empty(cap, np.uint8)
    lib = _build_and_load()
    if (lib is not None and x.dtype == np.uint16 and y.dtype == np.uint16
            and t.dtype == np.int64 and p.dtype in (np.uint8, np.bool_)):
        t0i = int(t[0]) if (t0 is None and n) else int(t0 or 0)
        lib.pack_window_sorted(
            _ptr(np.ascontiguousarray(x), ctypes.c_uint16),
            _ptr(np.ascontiguousarray(y), ctypes.c_uint16),
            _ptr(np.ascontiguousarray(t), ctypes.c_int64),
            _ptr(np.ascontiguousarray(p, np.uint8), ctypes.c_uint8),
            n, t0i, cap, height,
            _ptr(ox, ctypes.c_float), _ptr(oy, ctypes.c_float),
            _ptr(ot, ctypes.c_float), _ptr(op, ctypes.c_float),
            _ptr(valid, ctypes.c_uint8))
        return ox, oy, ot, op, valid.astype(bool)
    if lib is not None:
        xf = np.ascontiguousarray(x, np.float32)
        yf = np.ascontiguousarray(y, np.float32)
        pf = np.ascontiguousarray(p, np.float32)
        # rebase before narrowing, as in pack_window
        t64 = np.asarray(t, np.float64)
        off = float(t64[0]) if (t0 is None and n) else float(t0 or 0.0)
        tf = np.ascontiguousarray(t64 - off, np.float32)
        lib.pack_window_sorted_f32(
            _ptr(xf, ctypes.c_float), _ptr(yf, ctypes.c_float),
            _ptr(tf, ctypes.c_float), _ptr(pf, ctypes.c_float),
            n, 0.0, cap, height,
            _ptr(ox, ctypes.c_float), _ptr(oy, ctypes.c_float),
            _ptr(ot, ctypes.c_float), _ptr(op, ctypes.c_float),
            _ptr(valid, ctypes.c_uint8))
        return ox, oy, ot, op, valid.astype(bool)
    # numpy fallback: pack unsorted, then stable-sort the valid prefix by
    # the row key (identical grouping to the native kernel)
    ox, oy, ot, op, valid = pack_window(x, y, t, p, cap, t0=t0)
    m = min(n, cap)
    key = np.clip(np.trunc(oy[:m].astype(np.float64)), -1, height - 1)
    order = np.argsort(key, kind="stable")
    ox[:m], oy[:m] = ox[:m][order], oy[:m][order]
    ot[:m], op[:m] = ot[:m][order], op[:m][order]
    oy[m:] = float(height)
    return ox, oy, ot, op, valid
