"""ctypes bridge to the native block decoder (builds on first use).

The serial entropy decode is the one part of the codec that cannot be
vectorized (codewords are self-delimiting), so it lives in C++; everything
around it stays in Python/JAX. Falls back gracefully when no compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from functools import lru_cache

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native", "srla_decoder.cpp")
_LOCK = threading.Lock()


@lru_cache(maxsize=None)
def _load():
    cache_dir = os.path.join(os.path.dirname(__file__), "native", "build")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libsrla_native.so")
    with _LOCK:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
            cxx = os.environ.get("CXX", "g++")
            cmd = [cxx, "-O3", "-fwrapv", "-fPIC", "-shared", "-std=c++17",
                   _SRC, "-o", so_path]
            subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(so_path)
    lib.srla_decode_block.restype = ctypes.c_long
    lib.srla_decode_block.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p,
    ]
    lib.srla_rice_decode.restype = ctypes.c_long
    lib.srla_rice_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
        ctypes.c_void_p,
    ]
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        return False


@lru_cache(maxsize=None)
def _luts():
    """Full-depth Huffman decode LUTs: (sym int16, len uint8) per codebook."""
    from .huffman import parameter_codebook, sum_parameter_codebook
    out = []
    for cb in (parameter_codebook(), sum_parameter_codebook()):
        K = cb.max_length
        sym = np.zeros(1 << K, dtype=np.int16)
        length = np.zeros(1 << K, dtype=np.uint8)
        for s in range(cb.num_symbols):
            L = int(cb.lengths[s])
            c = int(cb.codes[s])
            base = c << (K - L)
            sym[base:base + (1 << (K - L))] = s
            length[base:base + (1 << (K - L))] = L
        out.append((sym, length, K))
    return out


def decode_block(payload: bytes, num_channels: int, bits_per_sample: int,
                 num_samples: int, offset_lshift: int) -> np.ndarray:
    """Decode one COMPRESS payload natively -> (C, n) int32 PCM."""
    lib = _load()
    (psym, plen, pk), (ssym, slen, sk) = _luts()
    out = np.empty((num_channels, num_samples), dtype=np.int32)
    r = lib.srla_decode_block(
        payload, len(payload), num_channels, bits_per_sample, num_samples,
        offset_lshift,
        psym.ctypes.data_as(ctypes.c_void_p),
        plen.ctypes.data_as(ctypes.c_void_p), pk,
        ssym.ctypes.data_as(ctypes.c_void_p),
        slen.ctypes.data_as(ctypes.c_void_p), sk,
        out.ctypes.data_as(ctypes.c_void_p))
    if r < 0:
        raise ValueError("native decoder: malformed block payload")
    return out
