"""Native exact-path analysis kernels must be bit-identical to the Python
host path (which in turn is byte-exact against the reference encoder).

Covers the C++ Stockham FFT (whose complex multiply must reproduce numpy's
fused-multiply-add rounding), the batched FFT autocorrelation, and the
batched Rice partition search. (Parity: libs/fft/src/fft.c:71-198,
libs/lpc/src/lpc.c:330-376, libs/srla_coder/src/srla_coder.c search loops.)
"""

import ctypes

import numpy as np
import pytest

from srla_tpu import native_decoder as nd
from srla_tpu.dsp.fft import complex_fft_c, real_fft, round_up_pow2
from srla_tpu.rice import analyze_batch

pytestmark = pytest.mark.skipif(not nd.available(),
                                reason="no native toolchain")


def _lib():
    lib = nd._load()
    lib.srla_debug_cfft.restype = None
    lib.srla_debug_cfft.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_void_p]
    lib.srla_debug_realfft.restype = None
    lib.srla_debug_realfft.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_void_p,
                                       ctypes.c_void_p]
    return lib


@pytest.mark.parametrize("n", [4, 8, 16, 32, 512, 2048])
def test_complex_fft_bit_exact(n):
    lib = _lib()
    rng = np.random.RandomState(n)
    z = rng.randn(n) + 1j * rng.randn(n)
    buf = np.ascontiguousarray(z.copy().view(np.float64))
    # note: complex_fft_c may transform in place — pass a copy
    ref = complex_fft_c(z[None].copy(), -1)[0]
    tw, _ = nd._fft_tables(2 * n)[-1]
    lib.srla_debug_cfft(buf.ctypes.data_as(ctypes.c_void_p), n, -1,
                        tw.ctypes.data_as(ctypes.c_void_p))
    assert (buf.view(np.complex128) == ref).all()


@pytest.mark.parametrize("n", [8, 64, 1024, 4096])
@pytest.mark.parametrize("flag", [-1, 1])
def test_real_fft_bit_exact(n, flag):
    lib = _lib()
    rng = np.random.RandomState(n + flag)
    x = rng.randn(n)
    buf = np.ascontiguousarray(x.copy())
    ref = real_fft(x[None].copy(), flag)[0]
    tw, rot = nd._fft_tables(n)[flag]
    lib.srla_debug_realfft(buf.ctypes.data_as(ctypes.c_void_p), n, flag,
                           tw.ctypes.data_as(ctypes.c_void_p),
                           rot.ctypes.data_as(ctypes.c_void_p))
    assert (buf == ref).all()


def _numpy_autocorr(windowed, num_samples, order):
    fft_size = round_up_pow2(num_samples)
    B = windowed.shape[0]
    buf = np.zeros((B, fft_size))
    buf[:, :num_samples] = windowed
    buf = real_fft(buf, -1)
    out = np.empty_like(buf)
    out[:, 0] = buf[:, 0] * buf[:, 0]
    out[:, 1] = buf[:, 1] * buf[:, 1]
    re = buf[:, 2::2]
    im = buf[:, 3::2]
    out[:, 2::2] = re * re + im * im
    out[:, 3::2] = 0.0
    out = real_fft(out, 1)
    return out[:, :order] * (2.0 / num_samples), out


@pytest.mark.parametrize("V,ns,order", [(7, 4096, 17), (5, 4095, 33),
                                        (3, 2048, 9), (4, 1027, 65)])
def test_autocorr_batch_bit_exact(V, ns, order):
    rng = np.random.RandomState(V)
    w = rng.randn(V, ns) * 1000
    ref_ac, ref_raw = _numpy_autocorr(w, ns, order)
    ac, raw = nd.autocorr_batch(w, round_up_pow2(ns), ns, order, True)
    assert (ac == ref_ac).all()
    assert (raw == ref_raw).all()


@pytest.mark.parametrize("scale", [0, 3, 300, 100000])
@pytest.mark.parametrize("n", [4096, 4095])
def test_rice_search_batch_bit_exact(scale, n, monkeypatch):
    rng = np.random.RandomState(scale)
    V = 9
    res = (rng.randn(V, n) * scale).astype(np.int32)
    ct, po, bits, ks = analyze_batch(res, n)  # native path
    monkeypatch.setattr(nd, "available", lambda: False)
    ct2, po2, bits2, ks2 = analyze_batch(res, n)  # numpy oracle
    assert (ct == ct2).all() and (po == po2).all()
    assert (bits == bits2).all()
    for v in range(V):
        nparts = 1 << int(po[v])
        assert (ks[v, :nparts] == ks2[v, :nparts]).all()


@pytest.mark.parametrize("seed", [0, 1])
def test_rice_search_wrap_heavy_bit_exact(seed, monkeypatch):
    """Blocks holding zigzag values >= 2^31 disable the sum lower-bound
    prune (srla_exact.cpp srla_rice_search_batch): the reference's
    int32-wrapping recursive quotient can undershoot the no-wrap bound
    there, so pruning could otherwise change the selected porder. Pin
    native == numpy oracle on wrap-heavy content (int32 extremes mixed
    into ordinary residuals)."""
    rng = np.random.RandomState(seed)
    V, n = 6, 4096
    res = (rng.randn(V, n) * 300).astype(np.int32)
    idx = rng.choice(n, 64, replace=False)
    res[:, idx[:16]] = np.int32(-(2 ** 31))
    res[:, idx[16:32]] = np.int32(2 ** 31 - 1)
    res[:, idx[32:]] = rng.randint(2 ** 30, 2 ** 31 - 1, 32,
                                   dtype=np.int64).astype(np.int32)
    ct, po, bits, ks = analyze_batch(res, n)  # native path
    monkeypatch.setattr(nd, "available", lambda: False)
    ct2, po2, bits2, ks2 = analyze_batch(res, n)  # numpy oracle
    assert (ct == ct2).all() and (po == po2).all()
    assert (bits == bits2).all()
    for v in range(V):
        nparts = 1 << int(po[v])
        assert (ks[v, :nparts] == ks2[v, :nparts]).all()


@pytest.mark.parametrize("seed", [0, 1])
def test_rice_k_boundary_fast_path(seed, monkeypatch):
    """The plain-Rice mean-space boundary fast path (srla_exact.cpp
    plain_rice_k) must decide exactly like the libm chain, including on
    means engineered to land at/near the k-step boundaries (quiet tonal
    content drives partition means through every fractional region)."""
    rng = np.random.RandomState(seed)
    rows = []
    # Constant and half-step rows: partition means exactly v and v + 0.5
    # for every small v (the first boundaries sit at m~1.66, 3.16, 6.7...).
    for v in range(0, 12):
        rows.append(np.full(1024, v))
        half = np.full(1024, v)
        half[::2] += 1
        rows.append(half)
    # Dense fractional sweep across the first four boundaries.
    for f in np.linspace(1.2, 8.0, 24):
        r = rng.poisson(f, 1024)
        rows.append(r)
    # Spike rows: all energy in ONE sample so the block mean stays < 2.0
    # (the plain-Rice gate) while the finest partitions' means sweep the
    # HIGH boundaries j=2..10 through plain_rice_k. The constant rows
    # above with v >= 2 have block mean >= 2.0 and take the recursive
    # branch, so without these the fast path only ever saw j=1.
    optx = 0.5127629514437670454896078808815218508243560791015625
    for j in range(2, 12):
        om = np.exp(np.log(optx) / (2.0 ** (j - 0.5)))
        mj = om / (1.0 - om)  # boundary j's mean (the k j-1 -> j step)
        for u in sorted({int(np.floor(mj)) - 1, int(np.floor(mj)),
                         int(np.ceil(mj)), int(np.ceil(mj)) + 1}):
            if 0 < u <= 2046:  # block mean u/1024 < 2.0
                r = np.zeros(1024, dtype=np.int64)
                r[rng.randint(1024)] = u
                rows.append(r)
    res = np.stack(rows).astype(np.int32)
    # zigzag^-1 so the search's zigzag recovers the intended u magnitudes
    res = np.where(res % 2 == 0, res // 2, -(res // 2) - 1)
    ct, po, bits, ks = analyze_batch(res, 1024)  # native path
    monkeypatch.setattr(nd, "available", lambda: False)
    ct2, po2, bits2, ks2 = analyze_batch(res, 1024)  # numpy oracle
    assert (ct == ct2).all() and (po == po2).all()
    assert (bits == bits2).all()
    for v in range(res.shape[0]):
        nparts = 1 << int(po[v])
        assert (ks[v, :nparts] == ks2[v, :nparts]).all()


def test_select_orders_native_matches_python(monkeypatch):
    """srla_select_orders_batch == the Python coarse-argmin + scalar-libm
    tie-repair result, including NaN/negative/zero/tied error variances
    (the native loop IS the repair chain — plain libm log/sqrt)."""
    from srla_tpu import native_decoder as nd
    from srla_tpu.encoder import EncodeParameter, SRLAEncoder
    if not nd.available():
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.RandomState(11)
    p = EncodeParameter(num_channels=1, bits_per_sample=16,
                        sampling_rate=44100, preset=6)
    enc = SRLAEncoder(p, backend="exact")
    for M in (8, 32, 255):
        B = 400
        ev = np.abs(rng.randn(B, M + 1)) * 10.0 ** rng.randint(
            -9, 3, (B, 1))
        ev[rng.rand(B, M + 1) < 0.02] = np.nan
        ev[rng.rand(B, M + 1) < 0.02] = -1.0
        ev[rng.rand(B, M + 1) < 0.05] = 0.0
        ev[0, :] = np.nan          # all invalid -> order 1 fallback
        ev[1, :] = ev[1, 1]        # constant row -> exact ties
        nat = nd.select_orders_batch(ev, 2048, 16, M, 8)
        monkeypatch.setattr(nd, "available", lambda: False)
        py = enc._select_order(ev.copy(), 2048, M)
        monkeypatch.undo()
        assert np.array_equal(nat, py), M


def test_account_bits_native_matches_python(monkeypatch):
    """srla_account_bits_batch == the vectorized Python accounting
    (zigzag + Huffman length LUTs + summed-codebook validity/choice)."""
    from srla_tpu import native_decoder as nd
    from srla_tpu.encoder import EncodeParameter, SRLAEncoder
    if not nd.available():
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.RandomState(12)
    p = EncodeParameter(num_channels=1, bits_per_sample=16,
                        sampling_rate=44100, preset=4, ltp_order=3)
    enc = SRLAEncoder(p, backend="exact")
    for _ in range(4):
        B, M = 500, 64
        orders = rng.randint(0, M + 1, B).astype(np.int32)
        coefs = rng.randint(-128, 128, (B, M)).astype(np.int32)
        rice_bits = rng.randint(0, 1 << 20, B).astype(np.int64)
        ltp_period = ((rng.rand(B) < 0.3).astype(np.int32)
                      * rng.randint(32, 256, B))
        nat_len, nat_us = enc._account_bits(rice_bits, orders, coefs,
                                            ltp_period, 3)
        monkeypatch.setattr(nd, "available", lambda: False)
        py_len, py_us = enc._account_bits(rice_bits, orders, coefs,
                                          ltp_period, 3)
        monkeypatch.undo()
        assert np.array_equal(nat_len, py_len)
        assert np.array_equal(nat_us, py_us)


def _levinson_adversarial_batch(rng, B, order):
    """Autocorrelation rows that exercise the recursion's failure modes:
    silent (r0=0 -> div-by-zero NaN chain), DC, sparse, a pure tone whose
    prediction error collapses toward 0 mid-recursion, and tiny scales."""
    acs = []
    for i in range(B):
        n = 4096
        x = rng.randn(n)
        if i % 7 == 1:
            x = np.zeros(n)
        elif i % 7 == 2:
            x = np.ones(n) * 0.5
        elif i % 7 == 3:
            x[::2] = 0
        elif i % 7 == 4:
            x = np.sin(np.arange(n) * 0.3)
        elif i % 7 == 5:
            x = x * 1e-4
        ac = np.correlate(x, x, "full")[n - 1:n + order]
        if len(ac) < order + 1:
            ac = np.pad(ac, (0, order + 1 - len(ac)))
        acs.append(ac)
    return np.array(acs)


@pytest.mark.parametrize("order", [8, 32, 255])
@pytest.mark.parametrize("B", [1, 3, 4, 9, 64])
def test_levinson_batch_bit_exact(order, B, monkeypatch):
    """Native Levinson (incl. the 4-lane AVX2 all-orders path and the
    early-stopped collect pass) == the NumPy recursion, bitwise. The AVX2
    leg runs whenever the host supports it; CI's SRLA_FORCE_SCALAR leg
    pins the scalar rows (parity: libs/lpc/src/lpc.c:379-441)."""
    from srla_tpu.dsp import levinson as lv
    rng = np.random.RandomState(order * 101 + B)
    ac = _levinson_adversarial_batch(rng, B, order)
    orders = rng.randint(0, order + 1, size=B).astype(np.int32)

    monkeypatch.setattr(nd, "available", lambda: False)
    ev0, pc0, _ = lv._recursion(ac, order)
    _, _, col0 = lv._recursion(ac, order, collect_orders=orders)
    monkeypatch.undo()

    ev1, pc1, _ = nd.levinson_batch(ac, order, None)
    _, _, col1 = nd.levinson_batch(ac, order, orders)
    assert np.array_equal(ev0, ev1, equal_nan=True)
    assert np.array_equal(pc0, pc1, equal_nan=True)
    assert np.array_equal(col0, col1, equal_nan=True)
