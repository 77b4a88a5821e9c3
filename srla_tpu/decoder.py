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
        # Capability accounting (no silent fallbacks): how many COMPRESS
        # blocks each path actually decoded in the last decode_whole call.
        self.stats = {"device_blocks": 0, "host_blocks": 0}
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
        bp, r = self._parse_params(payload, header)
        residual = np.zeros((C, num_samples), dtype=np.int32)
        for c in range(C):
            residual[c] = rice.decode(r, num_samples)
        bp.residual = residual
        return bp

    def _parse_params(self, payload: bytes, header: StreamHeader
                      ) -> tuple[_BlockParams, BitReader]:
        """Parse the parameter header of a compress payload; the returned
        reader is positioned at the first channel's residual section."""
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
        return _BlockParams(method, pre_prev, pre_coef, orders, rshifts,
                            coefs, ltp_orders, ltp_periods, ltp_coefs,
                            None), r

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


    # Device decode tuning. Groups smaller than _DEV_MIN_GROUP are decoded
    # on host (compiling a device program for a couple of stragglers costs
    # more than it saves); the fallback is counted in self.stats. Chunking
    # bounds the NEXT_ONE table's footprint (B * W * 32 * 4 bytes per chunk).
    _DEV_MIN_GROUP = 4
    _DEV_CHUNK = 512

    def _decode_whole_device(self, data: bytes,
                             header: StreamHeader) -> np.ndarray:
        """Fused scan decode: Rice unpack + LPC + LTP + de-emphasis + stereo
        inverse run in ONE device program per block group (kernels/decode.py
        decode_blocks_device); the host parses block/parameter headers and
        performs a single result fetch per group."""
        C, N = header.num_channels, header.num_samples
        pcm = np.zeros((C, N), dtype=np.int32)
        offset = HEADER_SIZE
        progress = 0
        groups: dict[int, list] = {}   # n -> [(progress, bp, payload, start)]
        while progress < N and offset < len(data):
            btype, nsamples, poff, psize = parse_block_header(
                data, offset, self.check_checksum)
            payload = data[poff:poff + psize]
            if btype == BlockDataType.RAW:
                pcm[:, progress:progress + nsamples] = self.decode_raw_block(
                    payload, header, nsamples)
            elif btype == BlockDataType.COMPRESS:
                bp, r = self._parse_params(payload, header)
                groups.setdefault(nsamples, []).append(
                    (progress, bp, payload, r.pos))
            offset = poff + psize
            progress += nsamples
        for n, entries in groups.items():
            if len(entries) < self._DEV_MIN_GROUP:
                self.stats["host_blocks"] += len(entries)
                for prog, bp, payload, start in entries:
                    r = BitReader(payload)
                    r.pos = start
                    bp.residual = np.stack(
                        [rice.decode(r, n) for _c in range(C)])
                    pcm[:, prog:prog + n] = self.synthesize_block(
                        bp, header, n)
                continue
            for lo in range(0, len(entries), self._DEV_CHUNK):
                chunk = entries[lo:lo + self._DEV_CHUNK]
                self._decode_group_device(chunk, header, n, pcm)
        return pcm

    def _decode_group_device(self, entries, header: StreamHeader, n: int,
                             pcm: np.ndarray) -> None:
        import jax.numpy as jnp

        from .kernels.decode import _MAX_LTP, decode_blocks_device

        C = header.num_channels
        B = len(entries)
        # Static-shape bucketing: device programs compile once per
        # (Bp, W, n, C, M) bucket and the persistent XLA cache makes later
        # processes start hot.
        Bp = 64
        while Bp < B:
            Bp *= 2
        W = max((max(len(p) for _, _, p, _ in entries) + 3) // 4, 1)
        W = ((W + 511) // 512) * 512
        # M buckets to multiples of 8 over the group's actual max order.
        M = max(int(max(int(bp.orders.max()) for _, bp, _, _ in entries)), 1)
        M = ((M + 7) // 8) * 8

        words = np.zeros((Bp, W), dtype=np.uint32)
        wv = words.view(np.uint8).reshape(Bp, W * 4)
        start_bits = np.zeros(Bp, np.int32)
        methods = np.zeros(Bp, np.int32)
        orders = np.zeros((Bp, C), np.int32)
        rshifts = np.zeros((Bp, C), np.int32)
        coefs = np.zeros((Bp, C, M), np.int32)
        ltp_orders = np.zeros((Bp, C), np.int32)
        ltp_periods = np.zeros((Bp, C), np.int32)
        ltp_coefs = np.zeros((Bp, C, _MAX_LTP), np.int32)
        pre_coef = np.zeros((Bp, C), np.int32)
        pre_prev = np.zeros((Bp, C), np.int32)
        for bi, (prog, bp, payload, start) in enumerate(entries):
            wv[bi, :len(payload)] = np.frombuffer(payload, np.uint8)
            start_bits[bi] = start
            methods[bi] = bp.method
            orders[bi] = bp.orders
            rshifts[bi] = bp.rshifts
            coefs[bi] = bp.coefs[:, :M]
            ltp_orders[bi] = bp.ltp_orders
            ltp_periods[bi] = bp.ltp_periods
            ltp_coefs[bi] = bp.ltp_coefs[:, :_MAX_LTP]
            pre_coef[bi] = bp.pre_coef
            pre_prev[bi] = bp.pre_prev
        words = words.byteswap()         # payload bytes are big-endian words
        # Padding rows decode as ALLZERO sections ('10' at bit 0).
        words[B:, 0] = 0x80000000
        out = decode_blocks_device(
            jnp.asarray(words), jnp.asarray(start_bits), jnp.asarray(orders),
            jnp.asarray(rshifts), jnp.asarray(coefs),
            jnp.asarray(ltp_orders), jnp.asarray(ltp_periods),
            jnp.asarray(ltp_coefs), jnp.asarray(pre_coef),
            jnp.asarray(pre_prev), jnp.asarray(methods),
            np.int32(header.offset_lshift), n=n, C=C, M=M)
        out = np.asarray(out)
        self.stats["device_blocks"] += B
        for bi, (prog, _, _, _) in enumerate(entries):
            pcm[:, prog:prog + n] = out[bi]


def decode(data: bytes, check_checksum: bool = True):
    return SRLADecoder(check_checksum).decode_whole(data)
