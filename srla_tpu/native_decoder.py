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

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRCS = [os.path.join(_NATIVE_DIR, "srla_decoder.cpp"),
         os.path.join(_NATIVE_DIR, "srla_assemble.cpp")]
_LOCK = threading.Lock()


@lru_cache(maxsize=None)
def _load():
    cache_dir = os.path.join(_NATIVE_DIR, "build")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libsrla_native.so")
    with _LOCK:
        if (not os.path.exists(so_path)
                or any(os.path.getmtime(so_path) < os.path.getmtime(s)
                       for s in _SRCS)):
            cxx = os.environ.get("CXX", "g++")
            cmd = [cxx, "-O3", "-fwrapv", "-fPIC", "-shared", "-std=c++17",
                   *_SRCS, "-o", so_path]
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
    lib.srla_decode_stream.restype = ctypes.c_long
    lib.srla_decode_stream.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p,
    ]
    lib.srla_assemble_blocks.restype = ctypes.c_long
    lib.srla_assemble_blocks.argtypes = (
        [ctypes.c_long] + [ctypes.c_int] * 4
        + [ctypes.c_void_p] * 13
        + [ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p])
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


@lru_cache(maxsize=None)
def _code_tables():
    from .huffman import parameter_codebook, sum_parameter_codebook
    out = []
    for cb in (parameter_codebook(), sum_parameter_codebook()):
        out.append((cb.codes.astype(np.uint32),
                    cb.lengths.astype(np.uint8)))
    return out


def assemble_blocks(method, pre_prev, pre_coef, orders, rshifts, coefs,
                    sections: bytes, sec_off_bytes, sec_bits,
                    num_channels: int, bits_per_sample: int,
                    num_samples: int):
    """Assemble framed COMPRESS blocks natively.

    method (B,); per-channel params shaped (B, C); coefs (B, C, maxorder);
    sections: concatenated packed residual-section bytes with per-(b,c) byte
    offsets and exact bit counts. Returns (buffer bytes, sizes (B,)) where
    size 0 marks a block that must be re-emitted as RAW by the caller.
    """
    lib = _load()
    (pcodes, plens), (scodes, slens) = _code_tables()
    B = len(method)
    C = num_channels
    maxorder = coefs.shape[2]
    method = np.ascontiguousarray(method, np.int32)
    pre_prev = np.ascontiguousarray(pre_prev, np.int32)
    pre_coef = np.ascontiguousarray(pre_coef, np.int32)
    orders = np.ascontiguousarray(orders, np.int32)
    rshifts = np.ascontiguousarray(rshifts, np.int32)
    coefs = np.ascontiguousarray(coefs, np.int32)
    sec_off = np.ascontiguousarray(sec_off_bytes, np.int64)
    sec_bits = np.ascontiguousarray(sec_bits, np.int64)
    cap = int(B * (11 + 64 * C)
              + (bits_per_sample + 2) * num_samples * C * B // 8)
    out = np.empty(cap, np.uint8)
    sizes = np.zeros(B, np.int64)

    def vp(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    total = lib.srla_assemble_blocks(
        B, C, bits_per_sample, num_samples, maxorder,
        vp(method), vp(pre_prev), vp(pre_coef), vp(orders), vp(rshifts),
        vp(coefs), vp(pcodes), vp(plens), vp(scodes), vp(slens),
        ctypes.cast(ctypes.c_char_p(sections), ctypes.c_void_p),
        vp(sec_off), vp(sec_bits),
        vp(out), cap, vp(sizes))
    if total < 0:
        raise ValueError("native assembler: output capacity exceeded")
    return out[:total].tobytes(), sizes


def decode_stream(body: bytes, num_channels: int, bits_per_sample: int,
                  num_samples: int, offset_lshift: int,
                  check_checksum: bool = True) -> np.ndarray:
    """Decode a whole .srl stream body (after the 30-byte header) natively."""
    lib = _load()
    (psym, plen, pk), (ssym, slen, sk) = _luts()
    out = np.empty((num_channels, num_samples), dtype=np.int32)
    r = lib.srla_decode_stream(
        body, len(body), num_channels, bits_per_sample, num_samples,
        offset_lshift, 1 if check_checksum else 0,
        psym.ctypes.data_as(ctypes.c_void_p),
        plen.ctypes.data_as(ctypes.c_void_p), pk,
        ssym.ctypes.data_as(ctypes.c_void_p),
        slen.ctypes.data_as(ctypes.c_void_p), sk,
        out.ctypes.data_as(ctypes.c_void_p))
    if r == -2:
        raise ValueError("data corruption detected (checksum mismatch)")
    if r < 0:
        raise ValueError("insufficient data")
    if r < num_samples:
        # Clean truncation at a block boundary: reference semantics decode
        # what is present and leave the tail silent.
        out[:, r:] = 0
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
