"""SRLA decoder — host reference path.

Parses blocks, entropy-decodes residuals, then runs the integer synthesis
chain (LPC recurrence, LTP, de-emphasis, stereo inverse, offset shift).
Block payloads are independent, so batched/TPU decode groups blocks and runs
the synthesis recurrences vectorized over the block axis (kernels/ module);
this module is the sequential oracle with identical integer semantics.

API parity targets: SRLADecoder_* in libs/srla_decoder/src/srla_decoder.c.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import rice
from .bitio import BitReader, uint32_to_sint32
from .constants import (HEADER_SIZE, LPC_COEFFICIENT_ORDER_BITWIDTH,
                        LTP_COEFFICIENT_BITWIDTH, LTP_MIN_PERIOD,
                        LTP_ORDER_BITWIDTH, LTP_PERIOD_BITWIDTH,
                        MAX_COEFFICIENT_ORDER, PREEMPHASIS_COEF_SHIFT,
                        RSHIFT_LPC_COEFFICIENT_BITWIDTH, BlockDataType,
                        ChProcessMethod)
from .dsp.predict import lpc_synthesize, ltp_synthesize
from .dsp.preemphasis import deemphasis
from .format import StreamHeader, decode_header, parse_block_header
from .huffman import parameter_codebook, sum_parameter_codebook


@dataclass
class _BlockParams:
    method: int
    pre_prev: np.ndarray
    pre_coef: np.ndarray
    orders: np.ndarray
    rshifts: np.ndarray
    coefs: np.ndarray
    ltp_orders: np.ndarray
    ltp_periods: np.ndarray
    ltp_coefs: np.ndarray
    residual: np.ndarray   # (C, n) int32


class SRLADecoder:
    def __init__(self, check_checksum: bool = True, use_native: bool = True,
                 backend: str = "native"):
        """backend="native": C++ whole-stream decode (fastest on one host).
        backend="tpu": entropy decode on host, the synthesis recurrences as
        batched device scans over the block axis (the BASELINE 'scan-based
        decode' shape — blocks are independent, so the within-block serial
        recurrence becomes one lax.scan step per sample over all blocks)."""
        self.check_checksum = check_checksum
        self.backend = backend
        self._param_cb = parameter_codebook()
        self._sum_cb = sum_parameter_codebook()
        self._native = None
        if use_native:
            from . import native_decoder
            if native_decoder.available():
                self._native = native_decoder

    def decode_block_params(self, payload: bytes, header: StreamHeader,
                            num_samples: int) -> _BlockParams:
        """Entropy-decode one compress-block payload into parameters+residuals."""
        C = header.num_channels
        r = BitReader(payload)
        method = r.get(2)
        pre_prev = np.zeros(C, dtype=np.int32)
        pre_coef = np.zeros(C, dtype=np.int32)
        for c in range(C):
            pre_prev[c] = uint32_to_sint32(
                np.uint32(r.get(header.bits_per_sample + 1)))
            pre_coef[c] = uint32_to_sint32(
                np.uint32(r.get(PREEMPHASIS_COEF_SHIFT + 1)))
        orders = np.zeros(C, dtype=np.int32)
        rshifts = np.zeros(C, dtype=np.int32)
        coefs = np.zeros((C, MAX_COEFFICIENT_ORDER), dtype=np.int32)
        for c in range(C):
            o = r.get(LPC_COEFFICIENT_ORDER_BITWIDTH)
            orders[c] = o
            rshifts[c] = r.get(RSHIFT_LPC_COEFFICIENT_BITWIDTH)
            use_sum = r.get(1)
            if not use_sum:
                for i in range(o):
                    coefs[c, i] = uint32_to_sint32(
                        np.uint32(self._param_cb.decode_one(r)))
            elif o > 0:
                coefs[c, 0] = uint32_to_sint32(
                    np.uint32(self._param_cb.decode_one(r)))
                for i in range(1, o):
                    v = uint32_to_sint32(np.uint32(self._sum_cb.decode_one(r)))
                    coefs[c, i] = np.int32(int(v) - int(coefs[c, i - 1]))
        ltp_orders = np.zeros(C, dtype=np.int32)
        ltp_periods = np.zeros(C, dtype=np.int32)
        ltp_coefs = np.zeros((C, 8), dtype=np.int32)
        for c in range(C):
            if r.get(1):
                ltp_orders[c] = 2 * r.get(LTP_ORDER_BITWIDTH) + 1
                ltp_periods[c] = r.get(LTP_PERIOD_BITWIDTH) + LTP_MIN_PERIOD
                for i in range(ltp_orders[c]):
                    ltp_coefs[c, i] = uint32_to_sint32(
                        np.uint32(r.get(LTP_COEFFICIENT_BITWIDTH)))
        residual = np.zeros((C, num_samples), dtype=np.int32)
        for c in range(C):
            residual[c] = rice.decode(r, num_samples)
        return _BlockParams(method, pre_prev, pre_coef, orders, rshifts, coefs,
                            ltp_orders, ltp_periods, ltp_coefs, residual)

    def synthesize_block(self, bp: _BlockParams, header: StreamHeader,
                         num_samples: int) -> np.ndarray:
        """Run the integer reconstruction chain for one decoded block."""
        C = header.num_channels
        buf = lpc_synthesize(bp.residual, bp.coefs, bp.orders, bp.rshifts,
                             num_samples)
        buf = ltp_synthesize(buf, bp.ltp_coefs, bp.ltp_orders, bp.ltp_periods,
                             LTP_COEFFICIENT_BITWIDTH - 1)
        buf = deemphasis(buf, bp.pre_coef, bp.pre_prev)
        with np.errstate(over="ignore"):
            if bp.method == ChProcessMethod.MS:
                buf[0] = (buf[0] - (buf[1] >> 1)).astype(np.int32)
                buf[1] = (buf[1] + buf[0]).astype(np.int32)
            elif bp.method == ChProcessMethod.LS:
                buf[1] = (buf[1] + buf[0]).astype(np.int32)
            elif bp.method == ChProcessMethod.SR:
                buf[0] = (buf[1] - buf[0]).astype(np.int32)
            if header.offset_lshift:
                buf = (buf << header.offset_lshift).astype(np.int32)
        return buf

    def decode_raw_block(self, payload: bytes, header: StreamHeader,
                         num_samples: int) -> np.ndarray:
        C = header.num_channels
        bps = header.bits_per_sample
        nbytes = bps // 8
        buf = np.frombuffer(payload[:num_samples * C * nbytes], dtype=np.uint8)
        buf = buf.reshape(num_samples, C, nbytes)
        uv = np.zeros((num_samples, C), dtype=np.uint32)
        for i in range(nbytes):
            uv = (uv << 8) | buf[:, :, i].astype(np.uint32)
        return uint32_to_sint32(uv).T.astype(np.int32).copy()

    def decode_block(self, data: bytes, header: StreamHeader, offset: int = 0
                     ) -> tuple[np.ndarray, int]:
        """Decode one framed block at `offset`; returns (pcm (C, n), consumed
        bytes). Parity: SRLADecoder_DecodeBlock (sync/size/checksum verify)."""
        btype, nsamples, poff, psize = parse_block_header(
            data, offset, self.check_checksum)
        payload = data[poff:poff + psize]
        C = header.num_channels
        if btype == BlockDataType.SILENT:
            pcm = np.zeros((C, nsamples), dtype=np.int32)
        elif btype == BlockDataType.RAW:
            pcm = self.decode_raw_block(payload, header, nsamples)
        else:
            if self._native is not None:
                pcm = self._native.decode_block(payload, C,
                                                header.bits_per_sample,
                                                nsamples,
                                                header.offset_lshift)
            else:
                bp = self.decode_block_params(payload, header, nsamples)
                pcm = self.synthesize_block(bp, header, nsamples)
        return pcm, (poff - offset) + psize

    def decode_whole(self, data: bytes) -> tuple[StreamHeader, np.ndarray]:
        header = decode_header(data)
        C, N = header.num_channels, header.num_samples
        if self.backend == "tpu":
            return header, self._decode_whole_device(data, header)
        if self._native is not None:
            pcm = self._native.decode_stream(
                data[HEADER_SIZE:], C, header.bits_per_sample, N,
                header.offset_lshift, self.check_checksum)
            return header, pcm
        pcm = np.zeros((C, N), dtype=np.int32)
        offset = HEADER_SIZE
        progress = 0
        while progress < N and offset < len(data):
            btype, nsamples, poff, psize = parse_block_header(
                data, offset, self.check_checksum)
            payload = data[poff:poff + psize]
            if btype == BlockDataType.RAW:
                pcm[:, progress:progress + nsamples] = self.decode_raw_block(
                    payload, header, nsamples)
            elif btype == BlockDataType.COMPRESS:
                if self._native is not None:
                    pcm[:, progress:progress + nsamples] = \
                        self._native.decode_block(
                            payload, C, header.bits_per_sample, nsamples,
                            header.offset_lshift)
                else:
                    bp = self.decode_block_params(payload, header, nsamples)
                    pcm[:, progress:progress + nsamples] = \
                        self.synthesize_block(bp, header, nsamples)
            offset = poff + psize
            progress += nsamples
        return header, pcm


    def _decode_whole_device(self, data: bytes,
                             header: StreamHeader) -> np.ndarray:
        """Scan-based decode: per-block entropy decode feeds batched device
        synthesis (one scan over the sample axis for ALL blocks at once);
        LTP blocks and the de-correlation/shift epilogue stay host-side."""
        from .kernels.decode import synthesize_blocks

        C, N = header.num_channels, header.num_samples
        pcm = np.zeros((C, N), dtype=np.int32)
        offset = HEADER_SIZE
        progress = 0
        groups: dict[int, list] = {}   # n -> [(progress, bp)]
        while progress < N and offset < len(data):
            btype, nsamples, poff, psize = parse_block_header(
                data, offset, self.check_checksum)
            payload = data[poff:poff + psize]
            if btype == BlockDataType.RAW:
                pcm[:, progress:progress + nsamples] = self.decode_raw_block(
                    payload, header, nsamples)
            elif btype == BlockDataType.COMPRESS:
                bp = self.decode_block_params(payload, header, nsamples)
                if (bp.ltp_periods > 0).any():
                    pcm[:, progress:progress + nsamples] = \
                        self.synthesize_block(bp, header, nsamples)
                else:
                    groups.setdefault(nsamples, []).append((progress, bp))
            offset = poff + psize
            progress += nsamples
        for n, entries in groups.items():
            res = np.stack([bp.residual for _, bp in entries])  # (B, C, n)
            B = res.shape[0]
            flat = res.reshape(B * C, n)
            coefs = np.stack([bp.coefs for _, bp in entries]).reshape(B * C,
                                                                      -1)
            orders = np.stack([bp.orders for _, bp in entries]).ravel()
            rshifts = np.stack([bp.rshifts for _, bp in entries]).ravel()
            pre_c = np.stack([bp.pre_coef for _, bp in entries]).ravel()
            pre_p = np.stack([bp.pre_prev for _, bp in entries]).ravel()
            out = synthesize_blocks(flat, coefs, orders, rshifts, pre_c,
                                    pre_p, n).reshape(B, C, n)
            with np.errstate(over="ignore"):
                for (prog, bp), buf in zip(entries, out):
                    buf = buf.astype(np.int32)
                    if bp.method == ChProcessMethod.MS:
                        buf[0] = (buf[0] - (buf[1] >> 1)).astype(np.int32)
                        buf[1] = (buf[1] + buf[0]).astype(np.int32)
                    elif bp.method == ChProcessMethod.LS:
                        buf[1] = (buf[1] + buf[0]).astype(np.int32)
                    elif bp.method == ChProcessMethod.SR:
                        buf[0] = (buf[1] - buf[0]).astype(np.int32)
                    if header.offset_lshift:
                        buf = (buf << header.offset_lshift).astype(np.int32)
                    pcm[:, prog:prog + n] = buf
        return pcm


def decode(data: bytes, check_checksum: bool = True):
    return SRLADecoder(check_checksum).decode_whole(data)
