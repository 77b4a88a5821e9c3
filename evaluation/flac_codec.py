"""Self-contained FLAC encoder/decoder (competitor row for the evaluation).

No FLAC binary or library exists in this environment and installs are not
permitted, so the competitor-codec comparison row is produced by this
from-scratch implementation of the FLAC format (spec: RFC 9639 /
xiph.org/flac/format.html — implemented from the public format description,
no code copied). Scope: the encoder-relevant subset at `flac -5`-like
settings — 16-bit PCM, fixed 4096-sample blocks, per-frame stereo-mode
selection (LR / left-side / right-side / mid-side), fixed predictors 0-4 AND
Levinson-Durbin LPC up to order 8 (precision 14), partitioned Rice residual
coding with per-partition parameter search.

Compression ratios are directly comparable to any conforming FLAC encoder at
similar settings. Speed rows are NOT comparable to the C `flac` tool (this
is numpy); the evaluation CSV marks them as such. Every encode is verified
by the included independent decoder (sample-exact round trip) plus the
STREAMINFO MD5.
"""

from __future__ import annotations

import hashlib

import numpy as np

BLOCK = 4096
MAX_LPC_ORDER = 8
LPC_PRECISION = 14
MAX_PART_ORDER = 5


# ---------------------------------------------------------------- bit I/O --
class _BW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nb = 0

    def put(self, val: int, nbits: int):
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.nb += nbits
        while self.nb >= 8:
            self.nb -= 8
            self.buf.append((self.acc >> self.nb) & 0xFF)
        self.acc &= (1 << self.nb) - 1

    def put_arrays(self, vals: np.ndarray, nbits: np.ndarray):
        """Vectorized multi-codeword append (big-int accumulation chunks)."""
        vals = vals.astype(object)
        nbits = nbits.astype(np.int64)
        # chunk to keep python-int sizes moderate
        CH = 2048
        for lo in range(0, len(vals), CH):
            v = vals[lo:lo + CH]
            nb = nbits[lo:lo + CH]
            total = int(nb.sum())
            acc = 0
            for x, b in zip(v, nb):
                acc = (acc << int(b)) | (int(x) & ((1 << int(b)) - 1))
            self.put_big(acc, total)

    def put_big(self, acc: int, nbits: int):
        self.acc = (self.acc << nbits) | (acc & ((1 << nbits) - 1))
        self.nb += nbits
        drop = self.nb - (self.nb & 7)
        if drop:
            self.nb -= drop
            top = self.acc >> self.nb
            self.buf += top.to_bytes(drop // 8, "big")
            self.acc &= (1 << self.nb) - 1

    def align(self):
        if self.nb:
            self.put(0, 8 - self.nb)

    def getvalue(self) -> bytes:
        assert self.nb == 0
        return bytes(self.buf)


class _BR:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def get(self, nbits: int) -> int:
        v = 0
        p = self.pos
        for _ in range(nbits):
            byte = self.data[p >> 3]
            v = (v << 1) | ((byte >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def get_unary(self) -> int:
        n = 0
        while self.get(1) == 0:
            n += 1
        return n

    def align(self):
        self.pos = (self.pos + 7) & ~7


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


_CRC16_TABLE = None


def _crc16(data: bytes) -> int:
    global _CRC16_TABLE
    if _CRC16_TABLE is None:
        tab = []
        for i in range(256):
            crc = i << 8
            for _ in range(8):
                crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                    else (crc << 1) & 0xFFFF
            tab.append(crc)
        _CRC16_TABLE = tab
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF]
    return crc


def _utf8_frameno(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    if n < 0x800:
        lead, nbytes = 0xC0, 2
    elif n < 0x10000:
        lead, nbytes = 0xE0, 3
    elif n < 0x200000:
        lead, nbytes = 0xF0, 4
    elif n < 0x4000000:
        lead, nbytes = 0xF8, 5
    else:
        lead, nbytes = 0xFC, 6
    for i in range(nbytes - 1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    out.append(lead | (n >> (6 * (nbytes - 1))))
    return bytes(reversed(out))


# ------------------------------------------------------------- rice sizing --
def _zigzag(r: np.ndarray) -> np.ndarray:
    r = r.astype(np.int64)
    return np.where(r >= 0, 2 * r, -2 * r - 1)


def _rice_cost_all_k(u: np.ndarray, kmax: int = 30) -> np.ndarray:
    """(parts, plen) zigzagged -> cost per k (parts, kmax+1)."""
    ks = np.arange(kmax + 1, dtype=np.int64)
    # sum(u >> k) + plen*(k+1)
    q = (u[:, :, None] >> ks[None, None, :]).sum(axis=1)
    return q + u.shape[1] * (ks[None, :] + 1)


def _best_partitions(res: np.ndarray, order: int, n: int):
    """Choose coding method + partition order + per-partition rice params.

    Returns (method, porder, ks, total_bits). Method 0 carries 4-bit rice
    params (k <= 14), method 1 5-bit (k <= 30); the escape code (all-ones
    param) is never emitted. Partition p>0 has n>>porder samples; partition
    0 has (n>>porder) - order samples."""
    u = _zigzag(res)
    best = None
    for po in range(0, MAX_PART_ORDER + 1):
        nparts = 1 << po
        plen = n >> po
        if plen <= order or n % nparts or plen < 1:
            continue
        first = u[:plen - order]
        rest = u[plen - order:]
        kmax = 30
        c0 = _rice_cost_all_k(first[None, :], kmax)[0] if len(first) else \
            np.zeros(kmax + 1, np.int64)
        cr = (_rice_cost_all_k(rest.reshape(nparts - 1, plen), kmax)
              if nparts > 1 else np.zeros((0, kmax + 1), np.int64))
        for method, klim, pb in ((0, 14, 4), (1, 30, 5)):
            ks = np.zeros(nparts, np.int64)
            costs = np.zeros(nparts, np.int64)
            ks[0] = int(np.argmin(c0[:klim + 1]))
            costs[0] = int(c0[ks[0]])
            if nparts > 1:
                ks[1:] = np.argmin(cr[:, :klim + 1], axis=1)
                costs[1:] = cr[np.arange(nparts - 1), ks[1:]]
            total = 2 + 4 + int(costs.sum()) + pb * nparts
            if best is None or total < best[3]:
                best = (method, po, ks.copy(), total)
    return best


def _emit_residuals(w: _BW, res: np.ndarray, order: int, n: int,
                    method: int, porder: int, ks: np.ndarray):
    w.put(method, 2)          # 0: 4-bit rice params, 1: 5-bit
    w.put(porder, 4)
    u = _zigzag(res)
    nparts = 1 << porder
    plen = n >> porder
    off = 0
    for p in range(nparts):
        cnt = plen - order if p == 0 else plen
        k = int(ks[p])
        w.put(k, 4 if method == 0 else 5)
        uu = u[off:off + cnt]
        q = (uu >> k).astype(object)
        # codeword: q zeros, 1, k low bits
        vals = np.array([(1 << k) | int(x & ((1 << k) - 1)) for x in uu],
                        dtype=object)
        nbits = np.asarray(q + 1 + k, dtype=np.int64)
        w.put_arrays(vals, nbits)
        off += cnt


# ------------------------------------------------------------- predictors --
_FIXED = {
    0: np.array([], np.int64),
    1: np.array([1], np.int64),
    2: np.array([2, -1], np.int64),
    3: np.array([3, -3, 1], np.int64),
    4: np.array([4, -6, 4, -1], np.int64),
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _lpc_coefs(x: np.ndarray, order: int):
    """Welch-windowed autocorrelation + Levinson; quantize to 14-bit."""
    n = len(x)
    d = x.astype(np.float64)
    w = 1.0 - (2.0 * np.arange(n) / (n - 1) - 1.0) ** 2
    dw = d * w
    ac = np.correlate(dw, dw, "full")[n - 1:n + order]
    if ac[0] == 0:
        return None
    err = ac[0]
    a = np.zeros(order + 1)
    for i in range(1, order + 1):
        acc = ac[i] - a[1:i] @ ac[1:i][::-1]
        k = acc / err
        a[1:i + 1] = np.concatenate([a[1:i] - k * a[1:i][::-1], [k]]) \
            if i > 1 else np.array([k])
        err *= (1 - k * k)
        if err <= 0:
            return None
    coefs = a[1:order + 1]
    cmax = np.abs(coefs).max()
    if cmax <= 0 or not np.isfinite(cmax):
        return None
    shift = LPC_PRECISION - 1 - max(int(np.floor(np.log2(cmax))) + 1, 0)
    shift = min(max(shift, 0), 15)
    q = np.round(coefs * (1 << shift)).astype(np.int64)
    lim = 1 << (LPC_PRECISION - 1)
    q = np.clip(q, -lim, lim - 1)
    if not q.any():
        return None
    return q, shift


def _lpc_residual(x: np.ndarray, q: np.ndarray, shift: int) -> np.ndarray:
    n = len(x)
    order = len(q)
    x64 = x.astype(np.int64)
    acc = np.zeros(n - order, np.int64)
    for i in range(order):
        acc += q[i] * x64[order - 1 - i:n - 1 - i]
    return x64[order:] - (acc >> shift)


def _subframe_cost(res: np.ndarray, order: int, n: int, bps: int,
                   header_extra: int):
    bp = _best_partitions(res, order, n)
    if bp is None:
        return None
    method, po, ks, bits = bp
    return (8 + order * bps + header_extra + bits, method, po, ks)


def _encode_subframe(w: _BW, x: np.ndarray, bps: int):
    n = len(x)
    if np.all(x == x[0]):
        w.put(0, 1); w.put(0, 6); w.put(0, 1)
        w.put(int(x[0]) & ((1 << bps) - 1), bps)
        return
    # candidates: fixed 0-4, lpc MAX_LPC_ORDER
    best = None
    for o in range(0, 5):
        if o >= n:
            break
        res = _fixed_residual(x, o)
        c = _subframe_cost(res, o, n, bps, 0)
        if c and (best is None or c[0] < best[0]):
            best = (c[0], "fixed", o, res, c[1], c[2], c[3], None)
    if n > 2 * MAX_LPC_ORDER:
        lc = _lpc_coefs(x, MAX_LPC_ORDER)
        if lc is not None:
            q, shift = lc
            res = _lpc_residual(x, q, shift)
            extra = 4 + 5 + MAX_LPC_ORDER * LPC_PRECISION
            c = _subframe_cost(res, MAX_LPC_ORDER, n, bps, extra)
            if c and (best is None or c[0] < best[0]):
                best = (c[0], "lpc", MAX_LPC_ORDER, res, c[1], c[2], c[3],
                        (q, shift))
    verb_cost = n * bps
    if best is None or best[0] >= verb_cost:
        w.put(0, 1); w.put(1, 6); w.put(0, 1)
        mask = (1 << bps) - 1
        w.put_arrays(np.asarray(x, np.int64) & mask,
                     np.full(n, bps, np.int64))
        return
    _, kind, order, res, method, po, ks, lp = best
    if kind == "fixed":
        w.put(0, 1); w.put(8 | order, 6); w.put(0, 1)
    else:
        w.put(0, 1); w.put(32 | (order - 1), 6); w.put(0, 1)
    mask = (1 << bps) - 1
    for s in x[:order]:
        w.put(int(s) & mask, bps)
    if kind == "lpc":
        q, shift = lp
        w.put(LPC_PRECISION - 1, 4)
        w.put(shift, 5)
        for c in q:
            w.put(int(c) & ((1 << LPC_PRECISION) - 1), LPC_PRECISION)
    _emit_residuals(w, res, order, n, method, po, ks)


_BS_CODE = {4096: 12}          # blocksize bits code (4096 -> 12)
_SR_CODE = {44100: 9, 48000: 10, 96000: 11, 32000: 8, 22050: 6, 16000: 5,
            8000: 4}


def encode_flac(pcm: np.ndarray, bps: int, rate: int) -> bytes:
    """pcm: (C, N) int; returns a complete FLAC stream."""
    C, N = pcm.shape
    assert C in (1, 2) and bps == 16
    frames = bytearray()
    fsizes = []
    for fno, off in enumerate(range(0, N, BLOCK)):
        blk = pcm[:, off:off + BLOCK]
        n = blk.shape[1]
        w = _BW()
        hdr = bytearray()
        # frame header assembled into bytes first (for crc8)
        hw = _BW()
        hw.put(0b11111111111110, 14)
        hw.put(0, 1)           # reserved
        hw.put(0, 1)           # fixed blocksize strategy
        bs_code = 12 if n == 4096 else (7 if n <= 65536 else 7)
        if n != 4096:
            bs_code = 7        # 16-bit blocksize-1 at frame end
        hw.put(bs_code, 4)
        sr_code = _SR_CODE.get(rate, 0)
        hw.put(sr_code, 4)
        # channel assignment per frame: try all, pick the cheapest by a
        # quick first-difference-abs-sum heuristic (like flac's loose mode)
        if C == 2:
            L = blk[0].astype(np.int64)
            R = blk[1].astype(np.int64)
            S = L - R
            M = (L + R) >> 1
            def est(x):
                d = np.abs(np.diff(np.diff(x)))
                return float(d.sum())
            costs = {1: est(L) + est(R), 8: est(L) + est(S),
                     9: est(S) + est(R), 10: est(M) + est(S)}
            # map: 1 -> independent stereo (code 1), 8 left/side,
            # 9 right/side, 10 mid/side
            assign = min(costs, key=costs.get)
            ch_code = 1 if assign == 1 else assign
        else:
            assign = 0
            ch_code = 0
        hw.put(ch_code, 4)
        hw.put(4, 3)           # sample size: 4 = 16 bits
        hw.put(0, 1)           # reserved
        hw.align()
        hdr += hw.getvalue()
        hdr += _utf8_frameno(fno)
        if bs_code == 7:
            hdr += bytes([(n - 1) >> 8, (n - 1) & 0xFF])
        hdr.append(_crc8(bytes(hdr)))
        w.buf += hdr
        if C == 1:
            _encode_subframe(w, blk[0], bps)
        elif assign == 1:
            _encode_subframe(w, blk[0], bps)
            _encode_subframe(w, blk[1], bps)
        elif assign == 8:
            _encode_subframe(w, blk[0].astype(np.int64), bps)
            _encode_subframe(w, (blk[0].astype(np.int64)
                                 - blk[1].astype(np.int64)), bps + 1)
        elif assign == 9:
            _encode_subframe(w, (blk[0].astype(np.int64)
                                 - blk[1].astype(np.int64)), bps + 1)
            _encode_subframe(w, blk[1], bps)
        else:
            L = blk[0].astype(np.int64)
            R = blk[1].astype(np.int64)
            _encode_subframe(w, (L + R) >> 1, bps)
            _encode_subframe(w, L - R, bps + 1)
        w.align()
        body = w.getvalue()
        crc = _crc16(body)
        frames += body + bytes([crc >> 8, crc & 0xFF])
        fsizes.append(len(body) + 2)

    # STREAMINFO
    si = _BW()
    si.put(BLOCK, 16)
    si.put(BLOCK, 16)
    si.put(min(fsizes), 24)
    si.put(max(fsizes), 24)
    si.put(rate, 20)
    si.put(C - 1, 3)
    si.put(bps - 1, 5)
    si.put(N, 36)
    raw = pcm.T.astype("<i2").tobytes()
    md5 = hashlib.md5(raw).digest()
    head = b"fLaC" + bytes([0x80, 0, 0, 34]) + si.getvalue() + md5
    return head + bytes(frames)


# ---------------------------------------------------------------- decoder --
def decode_flac(data: bytes):
    """Independent decoder for the subset above (verification oracle)."""
    assert data[:4] == b"fLaC"
    pos = 4
    streaminfo = None
    while True:
        hdr = data[pos:pos + 4]
        last = hdr[0] & 0x80
        btype = hdr[0] & 0x7F
        ln = (hdr[1] << 16) | (hdr[2] << 8) | hdr[3]
        body = data[pos + 4:pos + 4 + ln]
        if btype == 0:
            br = _BR(body)
            br.get(16); br.get(16); br.get(24); br.get(24)
            rate = br.get(20)
            C = br.get(3) + 1
            bps = br.get(5) + 1
            N = br.get(36)
            md5 = body[18:34]
            streaminfo = (rate, C, bps, N, md5)
        pos += 4 + ln
        if last:
            break
    rate, C, bps, N, md5 = streaminfo
    out = np.zeros((C, N), np.int64)
    done = 0
    while done < N:
        br = _BR(data[pos:])
        sync = br.get(14)
        assert sync == 0b11111111111110, hex(sync)
        br.get(1); br.get(1)
        bs_code = br.get(4)
        br.get(4)
        ch_code = br.get(4)
        br.get(3); br.get(1)
        # utf8 frame number
        b0 = br.get(8)
        extra = 0
        if b0 >= 0xC0:
            t = b0
            while t & 0x40:
                extra += 1
                t <<= 1
        for _ in range(extra):
            br.get(8)
        if bs_code == 12:
            n = 4096
        elif bs_code == 7:
            n = br.get(16) + 1
        elif bs_code == 6:
            n = br.get(8) + 1
        else:
            n = 4096
        br.get(8)  # crc8
        chans = []
        nch = C
        for c in range(nch):
            sbps = bps
            if ch_code == 8 and c == 1:
                sbps += 1
            if ch_code == 9 and c == 0:
                sbps += 1
            if ch_code == 10 and c == 1:
                sbps += 1
            chans.append(_decode_subframe(br, n, sbps))
        br.align()
        br.get(16)  # crc16
        if ch_code <= 7:
            dec = chans
        elif ch_code == 8:
            L = chans[0]; S = chans[1]
            dec = [L, L - S]
        elif ch_code == 9:
            S = chans[0]; R = chans[1]
            dec = [S + R, R]
        else:
            # mid = (L+R)>>1, side = L-R: restore the dropped low bit of
            # the sum from the side's parity, then halve.
            S = chans[1]
            M2 = (chans[0] << 1) | (S & 1)
            dec = [(M2 + S) >> 1, (M2 - S) >> 1]
        for c in range(C):
            out[c, done:done + n] = dec[c]
        done += n
        pos += (br.pos + 7) // 8
    raw = out.T.astype("<i2").tobytes()
    assert hashlib.md5(raw).digest() == md5, "MD5 mismatch"
    return out.astype(np.int32), rate, bps


def _decode_subframe(br: _BR, n: int, bps: int) -> np.ndarray:
    br.get(1)
    t = br.get(6)
    br.get(1)  # no wasted bits in our encoder

    def sgn(v, b):
        return v - (1 << b) if v >= (1 << (b - 1)) else v

    if t == 0:
        v = sgn(br.get(bps), bps)
        return np.full(n, v, np.int64)
    if t == 1:
        return np.array([sgn(br.get(bps), bps) for _ in range(n)], np.int64)
    if 8 <= t <= 12:
        order = t - 8
        warm = [sgn(br.get(bps), bps) for _ in range(order)]
        res = _read_residuals(br, n, order)
        x = np.empty(n, np.int64)
        x[:order] = warm
        for i in range(order, n):
            if order == 0:
                x[i] = res[i]
            elif order == 1:
                x[i] = res[i - order] + x[i - 1]
            elif order == 2:
                x[i] = res[i - order] + 2 * x[i - 1] - x[i - 2]
            elif order == 3:
                x[i] = res[i - order] + 3 * x[i - 1] - 3 * x[i - 2] + x[i - 3]
            else:
                x[i] = res[i - order] + 4 * x[i - 1] - 6 * x[i - 2] \
                    + 4 * x[i - 3] - x[i - 4]
        if order == 0:
            x = res.copy()
        return x
    if t >= 32:
        order = t - 31
        warm = [sgn(br.get(bps), bps) for _ in range(order)]
        prec = br.get(4) + 1
        shift = br.get(5)
        q = [sgn(br.get(prec), prec) for _ in range(order)]
        res = _read_residuals(br, n, order)
        x = np.empty(n, np.int64)
        x[:order] = warm
        for i in range(order, n):
            acc = 0
            for j in range(order):
                acc += q[j] * x[i - 1 - j]
            x[i] = res[i - order] + (acc >> shift)
        return x
    raise AssertionError(f"subframe type {t}")


def _read_residuals(br: _BR, n: int, order: int) -> np.ndarray:
    method = br.get(2)
    assert method in (0, 1)
    pb = 4 if method == 0 else 5
    po = br.get(4)
    nparts = 1 << po
    plen = n >> po
    out = np.empty(n - order, np.int64)
    off = 0
    for p in range(nparts):
        cnt = plen - order if p == 0 else plen
        k = br.get(pb)
        assert k != (1 << pb) - 1, "escape codes unsupported"
        for i in range(cnt):
            q = br.get_unary()
            low = br.get(k) if k else 0
            u = (q << k) | low
            out[off + i] = (u >> 1) ^ -(u & 1)
        off += cnt
    return out


if __name__ == "__main__":
    rng = np.random.RandomState(0)
    t = np.arange(44100 * 3) / 44100.0
    sig = (np.sin(2 * np.pi * 220 * t) * 8000
           + np.sin(2 * np.pi * 440 * t) * 3000
           + rng.randn(len(t)) * 120)
    pcm = np.stack([sig, np.roll(sig, 7) * 0.9]).round().astype(np.int32)
    data = encode_flac(pcm, 16, 44100)
    back, rate, bps = decode_flac(data)
    ok = np.array_equal(back, pcm)
    print(f"flac bytes={len(data)} ratio={len(data)/(pcm.size*2)*100:.2f}% "
          f"roundtrip={ok}")
