"""ctypes bindings to the native host library (csrc/libtbnb_host.so).

Host-side fast path for checkpoint conversion: quantize/pack fp32 weights to
NF4/FP4 on CPU threads without a device round-trip (the role the reference's
C++ host layer plays, csrc/mps_bitsandbytes.mm). Falls back silently to the
jnp implementation when the library hasn't been built (``make -C csrc``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

from ..functional import _pad_k  # single source of truth for the layout rule

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                 "libtbnb_host.so"),
    os.path.join(os.path.dirname(__file__), "libtbnb_host.so"),
]


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
                lib.tbnb_quantize_4bit_2d.restype = ctypes.c_int
                lib.tbnb_dequantize_4bit_2d.restype = ctypes.c_int
                lib.tbnb_quantize_rowwise.restype = ctypes.c_int
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def has_native_host() -> bool:
    return _load() is not None


def quantize_4bit_host(w: np.ndarray, blocksize: int = 64,
                       quant_type: str = "nf4",
                       num_threads: Optional[int] = None
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """fp32 [N,K] -> (packed [N, K_pad/2] uint8, absmax [N, blocks] f32).

    Bit-identical to the jnp ``quantize_4bit`` 2D path, computed on CPU
    threads (no device transfer of the fp weights).
    """
    lib = _load()
    w = np.ascontiguousarray(w, dtype=np.float32)
    n, k = w.shape
    kp = _pad_k(k, blocksize)
    packed = np.empty((n, kp // 2), np.uint8)
    absmax = np.empty((n, kp // blocksize), np.float32)
    if lib is None:
        # pure-numpy fallback (same math)
        from ..functional import NF4_CODEBOOK_NP, FP4_CODEBOOK_NP
        cb = NF4_CODEBOOK_NP if quant_type == "nf4" else FP4_CODEBOOK_NP
        wp = np.zeros((n, kp), np.float32)
        wp[:, :k] = w
        blocks = wp.reshape(n, kp // blocksize, blocksize)
        am = np.maximum(np.abs(blocks).max(axis=2), 1e-8)
        norm = blocks / am[:, :, None]
        idx = np.abs(norm[..., None] - cb).argmin(axis=-1).astype(np.uint8)
        flat = idx.reshape(n, kp)
        packed[:] = flat[:, 0::2] | (flat[:, 1::2] << 4)
        absmax[:] = am
        return packed, absmax
    nt = num_threads or min(os.cpu_count() or 1, 16)
    rc = lib.tbnb_quantize_4bit_2d(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n), ctypes.c_int64(k), ctypes.c_int64(blocksize),
        ctypes.c_int(0 if quant_type == "nf4" else 1),
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        absmax.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(nt))
    if rc != 0:
        raise ValueError(f"tbnb_quantize_4bit_2d failed (rc={rc})")
    return packed, absmax


def dequantize_4bit_host(packed: np.ndarray, absmax: np.ndarray, n: int,
                         k: int, blocksize: int = 64, quant_type: str = "nf4",
                         num_threads: Optional[int] = None) -> np.ndarray:
    lib = _load()
    out = np.empty((n, k), np.float32)
    if lib is None:
        from ..functional import NF4_CODEBOOK_NP, FP4_CODEBOOK_NP
        cb = NF4_CODEBOOK_NP if quant_type == "nf4" else FP4_CODEBOOK_NP
        kp = _pad_k(k, blocksize)
        p = packed.reshape(n, kp // 2)
        lo = p & 0x0F
        hi = p >> 4
        codes = np.empty((n, kp), np.uint8)
        codes[:, 0::2] = lo
        codes[:, 1::2] = hi
        vals = cb[codes] * np.repeat(absmax.reshape(n, -1), blocksize, axis=1)
        return vals[:, :k].astype(np.float32)
    nt = num_threads or min(os.cpu_count() or 1, 16)
    packed = np.ascontiguousarray(packed, np.uint8)
    absmax = np.ascontiguousarray(absmax, np.float32)
    rc = lib.tbnb_dequantize_4bit_2d(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        absmax.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n), ctypes.c_int64(k), ctypes.c_int64(blocksize),
        ctypes.c_int(0 if quant_type == "nf4" else 1),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ctypes.c_int(nt))
    if rc != 0:
        raise ValueError(f"tbnb_dequantize_4bit_2d failed (rc={rc})")
    return out


def quantize_rowwise_host(w: np.ndarray, num_threads: Optional[int] = None
                          ) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    w = np.ascontiguousarray(w, dtype=np.float32)
    n, k = w.shape
    out = np.empty((n, k), np.int8)
    scales = np.empty((n,), np.float32)
    if lib is None:
        am = np.maximum(np.abs(w).max(axis=1), 1e-8)
        q = np.clip(np.round(w * (127.0 / am[:, None])), -127, 127)
        return q.astype(np.int8), am.astype(np.float32)
    nt = num_threads or min(os.cpu_count() or 1, 16)
    rc = lib.tbnb_quantize_rowwise(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n), ctypes.c_int64(k),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(nt))
    if rc != 0:
        raise ValueError(f"tbnb_quantize_rowwise failed (rc={rc})")
    return out, scales
