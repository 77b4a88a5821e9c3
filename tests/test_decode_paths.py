"""Decode-path equivalence: native C++, JAX batched synthesis, streaming API
must all match the Python oracle."""

import numpy as np
import pytest

import signals
from srla_tpu import decode, encode
from srla_tpu.decoder import SRLADecoder
from srla_tpu.streaming import StreamingDecoder


def test_native_matches_python_decoder():
    pcm = signals.chirp(32768, 2, 16)
    data = encode(pcm, 16, 44100, preset=4)
    _, py = SRLADecoder(use_native=False).decode_whole(data)
    _, nat = SRLADecoder(use_native=True).decode_whole(data)
    assert np.array_equal(py, nat)
    assert np.array_equal(py, pcm)


def test_streaming_decoder_blocks():
    pcm = signals.pitchy(20480, 2, 16)
    data = encode(pcm, 16, 44100, preset=4, ltp_order=3)
    sd = StreamingDecoder(data)
    chunks = list(sd.blocks())
    out = np.concatenate(chunks, axis=1)
    assert np.array_equal(out, pcm)


def test_streaming_seek_resume():
    pcm = signals.sine(20480, 1, 16)
    data = encode(pcm, 16, 44100, preset=2)
    sd = StreamingDecoder(data)
    first = sd.decode_block()
    mark = sd.tell()
    second = sd.decode_block()
    sd.seek_to_block(*mark)
    again = sd.decode_block()
    assert np.array_equal(second, again)
    assert first.shape[1] + second.shape[1] <= pcm.shape[1]


def test_jax_synthesis_matches_host():
    from srla_tpu.dsp.predict import lpc_predict, lpc_synthesize
    from srla_tpu.dsp.preemphasis import deemphasis, preemphasis
    from srla_tpu.kernels.decode import synthesize_blocks
    rng = np.random.RandomState(0)
    V, n, order = 6, 2048, 24
    data = rng.randint(-20000, 20000, size=(V, n)).astype(np.int32)
    pre_coef = rng.randint(-16, 16, size=V).astype(np.int32)
    pre_prev = data[:, 0].copy()
    filtered = preemphasis(data, pre_coef, pre_prev)
    coefs = np.zeros((V, 64), dtype=np.int32)
    coefs[:, :order] = rng.randint(-100, 100, size=(V, order))
    orders = np.full(V, order, dtype=np.int32)
    orders[0] = 0  # exercise the order-0 path
    rshifts = np.full(V, 9, dtype=np.int32)
    resid = lpc_predict(filtered, coefs, orders, rshifts)
    # host oracle
    back = lpc_synthesize(resid, coefs, orders, rshifts, n)
    host = deemphasis(back, pre_coef, pre_prev)
    # jax batched path
    dev = synthesize_blocks(resid, coefs, orders, rshifts, pre_coef,
                            pre_prev, n)
    assert np.array_equal(dev, host)
    assert np.array_equal(host, data)


@pytest.mark.parametrize("kw", [dict(preset=4), dict(preset=0),
                                dict(preset=2, ltp_order=3),
                                dict(preset=6, variable_divisions=2)])
def test_device_scan_decode_matches_host(kw):
    """backend='tpu' decode (fused entropy+synthesis scan) must reproduce
    the host decode exactly, including mixed LTP/stereo/raw/silent blocks."""
    from srla_tpu.decoder import SRLADecoder

    rng = np.random.RandomState(5)
    sig = (np.clip(rng.randn(2, 4096 * 5 + 7), -4, 4) * 800).astype(np.int32)
    sig[:, 4096:8192] = 0  # silent block
    sig <<= 3              # exercise offset_lshift (stays within 16 bits)
    data = encode(sig, 16, 44100, **kw)
    _, host = decode(data)
    hdr, dev = SRLADecoder(backend="tpu").decode_whole(data)
    assert np.array_equal(dev, host)
    assert np.array_equal(dev, sig)


@pytest.mark.parametrize("name,mk,bps,kw", [
    ("mono", lambda: signals.chirp(50000, 1, 16), 16, {}),
    ("8ch", lambda: np.stack([signals.chirp(30000, 1, 16)[0] >> c
                              for c in range(8)]), 16, {}),
    ("24bit", lambda: (signals.chirp(50000, 2, 16) * 200).astype(np.int32),
     24, dict(preset=2)),
    ("ltp-pitchy", lambda: signals.pitchy(50000, 2, 16), 16,
     dict(ltp_order=3)),
    ("odd-tail", lambda: signals.chirp(44100 + 1234, 2, 16), 16,
     dict(max_block=4096)),
    ("B2048", lambda: signals.chirp(70000, 2, 16), 16,
     dict(max_block=2048)),
])
def test_device_decode_full_coverage(name, mk, bps, kw):
    """Every block type/config decodes ON DEVICE: the fused scan handles
    LTP, all channel layouts, bit depths, lshift, and odd tails; only
    straggler groups below _DEV_MIN_GROUP fall back (accounted in stats)."""
    from srla_tpu.decoder import SRLADecoder

    pcm = mk()
    stream = encode(pcm, bps, 44100, backend="exact", **kw)
    dec = SRLADecoder(backend="tpu")
    _, dev = dec.decode_whole(stream)
    assert np.array_equal(dev, pcm)
    # The device must carry the bulk of the work (no silent whole-stream
    # fallback); tiny straggler groups may stay on host.
    assert dec.stats["device_blocks"] > dec.stats["host_blocks"]
