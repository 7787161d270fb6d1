"""ctypes bindings for the native host-side XNOR engine.

Builds ``libxnor_cpu.so`` on first use (g++ with -O3 -march=native -fopenmp)
and exposes numpy-facing wrappers. This is the CPU serving backend the
reference only claims ("up to x64 CPU speed-up", reference README.md:22);
the TPU path lives in :mod:`bnn_tpu.kernels`.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "xnor_cpu.cpp")
_LIB_PATH = os.path.join(_HERE, "libxnor_cpu.so")
_lock = threading.Lock()
_lib = None

__all__ = ["available", "pack_rows", "pack_weights", "gemm", "num_threads"]


def _build_and_load(src: str, lib_path: str) -> ctypes.CDLL:
    """Shared stale-check + g++ build + dlopen recipe for both native
    libraries (one copy so flag/staleness changes can't diverge)."""
    if not os.path.exists(lib_path) or \
            os.path.getmtime(lib_path) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
             src, "-o", lib_path],
            check=True, capture_output=True)
    return ctypes.CDLL(lib_path)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib = _build_and_load(_SRC, _LIB_PATH)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64 = ctypes.c_int64
        lib.bnn_pack_rows.argtypes = [f32p, u32p, i64, i64]
        lib.bnn_pack_weights.argtypes = [f32p, u32p, i64, i64]
        lib.bnn_gemm.argtypes = [u32p, u32p, f32p, i64, i64, i64, f32p, f32p]
        lib.bnn_gemm_f32.argtypes = [f32p, u32p, f32p, u32p, i64, i64, i64,
                                     f32p, f32p]
        lib.bnn_num_threads.restype = ctypes.c_int
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _u32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _f32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def num_threads() -> int:
    return _load().bnn_num_threads()


def pack_rows(x: np.ndarray) -> np.ndarray:
    """Pack sign bits of a row-major (M, K) float array into (M, Kw) uint32."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    m, k = x.shape
    out = np.empty((m, (k + 31) // 32), np.uint32)
    lib.bnn_pack_rows(_f32(x), _u32(out), m, k)
    return out


def pack_weights(w: np.ndarray) -> np.ndarray:
    """Pack a (K, N) float weight matrix into (Kw, N) uint32 (framework
    layout — interchangeable with :func:`bnn_tpu.kernels.pack_bits`)."""
    lib = _load()
    w = np.ascontiguousarray(w, np.float32)
    k, n = w.shape
    out = np.empty(((k + 31) // 32, n), np.uint32)
    lib.bnn_pack_weights(_f32(w), _u32(out), k, n)
    return out


def gemm(x: np.ndarray, w_packed: np.ndarray, k: int,
         scale: Optional[np.ndarray] = None,
         add: Optional[np.ndarray] = None) -> np.ndarray:
    """``sign(x) @ unpack(w_packed) * scale + add`` via XNOR+popcount.

    ``x``: (M, K) float32 (packed internally); returns (M, N) float32.
    """
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    w_packed = np.ascontiguousarray(w_packed, np.uint32)
    m, k_in = x.shape
    assert k_in == k
    kw, n = w_packed.shape
    assert kw == (k + 31) // 32
    out = np.empty((m, n), np.float32)
    scratch = np.empty((m, kw), np.uint32)
    null_f32 = ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    # keep contiguous copies alive for the duration of the call
    scale_c = np.ascontiguousarray(scale, np.float32) if scale is not None else None
    add_c = np.ascontiguousarray(add, np.float32) if add is not None else None
    lib.bnn_gemm_f32(_f32(x), _u32(w_packed), _f32(out), _u32(scratch),
                     m, k, n,
                     _f32(scale_c) if scale_c is not None else null_f32,
                     _f32(add_c) if add_c is not None else null_f32)
    return out


# ----------------------------------------------------------------------
# Native data-loader stage (dataloader.cpp): gather + augment + normalize
# a batch in one GIL-free OpenMP call — the torch-DataLoader-worker
# equivalent (reference examples/imagenet.py:279-297).
# ----------------------------------------------------------------------

_DL_SRC = os.path.join(_HERE, "dataloader.cpp")
_DL_LIB_PATH = os.path.join(_HERE, "libbnndata.so")
_dl_lib = None


def _load_dl():
    global _dl_lib
    with _lock:
        if _dl_lib is not None:
            return _dl_lib
        lib = _build_and_load(_DL_SRC, _DL_LIB_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64 = ctypes.c_int64
        lib.bnn_load_batch.argtypes = [
            u8p, i64, i64, i64,       # images, H, W, C
            i64p, i64,                # indices, batch
            i32p, f32p, i32p,         # labels, out_x, out_y
            f32p, f32p,               # scale, bias
            i64, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ]
        lib.bnn_loader_num_threads.restype = ctypes.c_int
        _dl_lib = lib
        return lib


def loader_available() -> bool:
    try:
        _load_dl()
        return True
    except Exception:
        return False


def load_batch(images: np.ndarray, indices: np.ndarray,
               labels: Optional[np.ndarray],
               scale: np.ndarray, bias: np.ndarray, *,
               pad: int = 0, pad_mode: str = "zeros", flip: bool = False,
               seed: int = 0,
               out_x: Optional[np.ndarray] = None,
               out_y: Optional[np.ndarray] = None):
    """Assemble one normalized float32 batch from a uint8 NHWC store.

    ``out = u8[idx] * scale[c] + bias[c]`` per channel, after an optional
    padded random crop (``pad`` > 0) and random horizontal flip. Each
    sample's augmentation randomness depends only on ``(seed, index)``.
    Returns ``(out_x, out_y)``; pass preallocated arrays to avoid
    per-batch allocation.
    """
    lib = _load_dl()
    assert images.dtype == np.uint8 and images.ndim == 4, \
        "images must be (N, H, W, C) uint8"
    assert images.flags.c_contiguous
    n, h, w, c = images.shape
    indices = np.ascontiguousarray(indices, np.int64)
    batch = indices.shape[0]
    # bounds-check in Python: the C kernel takes no N and would read
    # out-of-bounds memory (garbage labels or a segfault) where the numpy
    # fallback raises IndexError
    if batch and (int(indices.min()) < 0 or int(indices.max()) >= n):
        raise IndexError(
            f"indices out of range [0, {n}): "
            f"[{int(indices.min())}, {int(indices.max())}]")
    if labels is not None and np.shape(labels)[0] != n:
        raise ValueError(
            f"labels length {np.shape(labels)[0]} != images length {n}")
    if out_x is None:
        out_x = np.empty((batch, h, w, c), np.float32)
    if labels is not None:
        labels = np.ascontiguousarray(labels, np.int32)
        if out_y is None:
            out_y = np.empty((batch,), np.int32)
    scale = np.ascontiguousarray(scale, np.float32)
    bias = np.ascontiguousarray(bias, np.float32)
    assert scale.shape == (c,) and bias.shape == (c,)
    u8p = images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    i64p = indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    null_i32 = ctypes.cast(None, ctypes.POINTER(ctypes.c_int32))
    lib.bnn_load_batch(
        u8p, h, w, c, i64p, batch,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        if labels is not None else null_i32,
        _f32(out_x),
        out_y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        if out_y is not None else null_i32,
        _f32(scale), _f32(bias),
        pad, {"zeros": 0, "reflect": 1}[pad_mode], int(flip), seed,
    )
    return out_x, out_y


def loader_num_threads() -> int:
    return _load_dl().bnn_loader_num_threads()
