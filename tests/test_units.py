"""Component unit tests: bit I/O, Fletcher-16, Huffman, Rice, FFT, filters."""

import math

import numpy as np
import pytest

from srla_tpu.bitio import (BitReader, BitWriter, sint32_to_uint32,
                            uint32_to_sint32)
from srla_tpu.dsp.fft import complex_fft, real_fft
from srla_tpu.dsp.predict import (lpc_predict, lpc_synthesize, ltp_predict,
                                  ltp_synthesize)
from srla_tpu.dsp.preemphasis import deemphasis, preemphasis
from srla_tpu.fletcher import fletcher16
from srla_tpu.huffman import parameter_codebook, sum_parameter_codebook
from srla_tpu import rice


def test_zigzag_roundtrip():
    x = np.array([0, -1, 1, -2, 2, 2**31 - 1, -2**31], dtype=np.int32)
    u = sint32_to_uint32(x)
    assert list(u[:5]) == [0, 1, 2, 3, 4]
    assert np.array_equal(uint32_to_sint32(u), x)


def test_bitwriter_msb_first():
    w = BitWriter()
    w.put(0b101, 3)
    w.put(0b01, 2)
    w.put(0xFF, 8)
    assert w.getvalue() == bytes([0b10101111, 0b11111000])


def test_bit_roundtrip_random():
    rng = np.random.RandomState(0)
    vals, widths = [], []
    w = BitWriter()
    for _ in range(1000):
        nb = int(rng.randint(1, 33))
        v = int(rng.randint(0, 2**min(nb, 31)))
        w.put(v, nb)
        vals.append(v)
        widths.append(nb)
    r = BitReader(w.getvalue())
    for v, nb in zip(vals, widths):
        assert r.get(nb) == v


def test_zero_run():
    w = BitWriter()
    for run in (0, 1, 5, 31, 32, 100):
        w.put_zero_run(run)
        w.put(0b1010, 4)
    r = BitReader(w.getvalue())
    for run in (0, 1, 5, 31, 32, 100):
        assert r.get_zero_run() == run
        assert r.get(4) == 0b1010


def test_fletcher16_vectors():
    # Classic Fletcher-16 test vectors.
    assert fletcher16(b"abcde") == 0xC8F0
    assert fletcher16(b"abcdef") == 0x2057
    assert fletcher16(b"abcdefgh") == 0x0627
    assert fletcher16(bytes(range(256)) * 100) == fletcher16(bytes(range(256)) * 100)


def test_huffman_codes_prefix_free():
    for cb in (parameter_codebook(), sum_parameter_codebook()):
        codes = [(int(cb.codes[s]), int(cb.lengths[s])) for s in range(256)]
        assert sum(2.0 ** -l for _, l in codes) <= 1.0 + 1e-12  # Kraft
        seen = set()
        for c, l in codes:
            assert (c, l) not in seen
            seen.add((c, l))


def test_huffman_roundtrip():
    cb = parameter_codebook()
    rng = np.random.RandomState(1)
    syms = rng.randint(0, 256, size=500)
    w = BitWriter()
    w.put(cb.codes[syms], cb.lengths[syms])
    r = BitReader(w.getvalue())
    for s in syms:
        assert cb.decode_one(r) == s


@pytest.mark.parametrize("kind", ["zeros", "small", "large", "mixed"])
def test_rice_roundtrip(kind):
    rng = np.random.RandomState(2)
    n = 4096
    if kind == "zeros":
        data = np.zeros(n, dtype=np.int32)
    elif kind == "small":
        data = rng.randint(-2, 3, size=n).astype(np.int32)
    elif kind == "large":
        data = rng.randint(-30000, 30000, size=n).astype(np.int32)
    else:
        data = (rng.randn(n) * np.where(np.arange(n) < n // 2, 3, 3000))
        data = data.astype(np.int32)
    w = BitWriter()
    rice.encode_into(w, data, n)
    r = BitReader(w.getvalue())
    out = rice.decode(r, n)
    assert np.array_equal(out, data)
    # Cost accounting must match actually-emitted bits.
    assert rice.compute_code_length(data, n) == w.tell_bits()


def test_fft_matches_numpy():
    rng = np.random.RandomState(3)
    for n in (4, 16, 64, 256, 1024):
        x = rng.randn(3, n)
        xr, xi = complex_fft(x, np.zeros_like(x), -1)
        ref = np.fft.fft(x, axis=-1)
        np.testing.assert_allclose(xr, ref.real, rtol=1e-10, atol=1e-9)
        np.testing.assert_allclose(xi, ref.imag, rtol=1e-10, atol=1e-9)
        # IFFT is unnormalized: ifft(fft(x)) == n * x
        br, bi = complex_fft(xr, xi, 1)
        np.testing.assert_allclose(br / n, x, rtol=1e-10, atol=1e-9)


def test_real_fft_roundtrip():
    rng = np.random.RandomState(4)
    for n in (8, 64, 4096):
        x = rng.randn(2, n)
        f = real_fft(x, -1)
        b = real_fft(f, 1)
        np.testing.assert_allclose(b * (2.0 / n), x, rtol=1e-9, atol=1e-9)


def test_lpc_predict_synthesize_inverse():
    rng = np.random.RandomState(5)
    B, n, order = 4, 1024, 16
    data = rng.randint(-30000, 30000, size=(B, n)).astype(np.int32)
    coefs = np.zeros((B, 32), dtype=np.int32)
    coefs[:, :order] = rng.randint(-100, 100, size=(B, order))
    orders = np.full(B, order, dtype=np.int32)
    rshifts = np.full(B, 8, dtype=np.int32)
    resid = lpc_predict(data, coefs, orders, rshifts)
    back = lpc_synthesize(resid, coefs, orders, rshifts, n)
    assert np.array_equal(back, data)


def test_ltp_inverse():
    rng = np.random.RandomState(6)
    B, n, order = 3, 2048, 3
    data = rng.randint(-20000, 20000, size=(B, n)).astype(np.int32)
    coefs = rng.randint(-32, 32, size=(B, order)).astype(np.int32)
    periods = np.array([0, 50, 262], dtype=np.int32)
    resid = ltp_predict(data, coefs, order, periods, 5)
    back = ltp_synthesize(resid, coefs, np.full(B, order, np.int32),
                          periods, 5)
    assert np.array_equal(back, data)


def test_preemphasis_inverse():
    rng = np.random.RandomState(7)
    B, n = 4, 512
    data = rng.randint(-30000, 30000, size=(B, n)).astype(np.int32)
    coef = np.array([-16, 0, 7, 15], dtype=np.int32)
    prev = data[:, 0].copy()
    filt = preemphasis(data, coef, prev)
    back = deemphasis(filt, coef, prev)
    assert np.array_equal(back, data)


def test_dijkstra_known_paths():
    """Hand-built adjacency with known shortest paths (parity:
    test/srla_encoder/srla_encoder_test.cpp Dijkstra cases)."""
    from srla_tpu.encoder import _dijkstra
    BIG = 1e30
    # 0 -> 1 (1), 0 -> 2 (4), 1 -> 2 (2), 1 -> 3 (6), 2 -> 3 (3)
    adj = np.full((4, 4), BIG)
    adj[0, 1] = 1.0
    adj[0, 2] = 4.0
    adj[1, 2] = 2.0
    adj[1, 3] = 6.0
    adj[2, 3] = 3.0
    path = _dijkstra(adj, 4, 0, 3, BIG)
    # Reconstruct 3 <- 2 <- 1 <- 0 (total 6 beats direct 7 and 0-2-3 = 7).
    assert path[3] == 2 and path[2] == 1 and path[1] == 0
    # Line graph: forced single path.
    adj = np.full((3, 3), BIG)
    adj[0, 1] = 5.0
    adj[1, 2] = 5.0
    path = _dijkstra(adj, 3, 0, 2, BIG)
    assert path[2] == 1 and path[1] == 0


def test_encode_parameter_validation():
    """Parameter contract (parity: SRLAEncoder_SetEncodeParameter rejects)."""
    from srla_tpu.encoder import EncodeParameter

    def make(**kw):
        base = dict(num_channels=2, bits_per_sample=16, sampling_rate=44100,
                    preset=4, max_num_samples_per_block=4096,
                    min_num_samples_per_block=4096,
                    num_lookahead_samples=16384)
        base.update(kw)
        return EncodeParameter(**base)

    make().validate()  # baseline OK
    with pytest.raises(ValueError):
        make(bits_per_sample=12).validate()
    with pytest.raises(ValueError):
        make(min_num_samples_per_block=8192).validate()
    with pytest.raises(ValueError):
        make(num_lookahead_samples=1024).validate()
    with pytest.raises(ValueError):
        make(num_lookahead_samples=4096 * 4 + 1,
             min_num_samples_per_block=4096).validate()
    with pytest.raises(ValueError):
        make(ltp_order=2).validate()
    with pytest.raises(ValueError):
        make(ltp_order=5).validate()
