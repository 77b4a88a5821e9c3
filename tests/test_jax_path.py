"""JAX fast-path (backend="tpu") validation on the CPU backend: streams must
be valid, losslessly decodable (by us and by the reference decoder), with
compression close to the exact path."""

import numpy as np
import pytest

import signals
from srla_tpu import decode, encode


@pytest.mark.parametrize("name,preset", [
    ("sine", 2), ("white_noise", 4), ("chirp", 4), ("gaussian_noise", 6),
    ("quiet_noise", 2), ("silence", 4), ("positive_constant", 4),
    ("tiny_impulse", 4),
])
def test_fast_path_lossless(name, preset):
    pcm = signals.ALL[name](49152, 2, 16)
    fast = encode(pcm, 16, 44100, preset=preset, backend="tpu")
    _, out = decode(fast)
    assert np.array_equal(out, pcm)


def test_fast_path_compression_parity():
    rng = np.random.RandomState(3)
    n = 49152
    t = np.arange(n) / 44100.0
    sig = (np.sin(2 * np.pi * 220 * t) * 0.3 + rng.randn(n) * 0.05)
    pcm = np.stack([np.round(sig * 20000),
                    np.round(np.roll(sig, 3) * 18000)]).astype(np.int32)
    fast = encode(pcm, 16, 44100, preset=4, backend="tpu")
    exact = encode(pcm, 16, 44100, preset=4)
    assert len(fast) <= 1.02 * len(exact)
    _, out = decode(fast)
    assert np.array_equal(out, pcm)


def test_fast_path_24bit():
    pcm = signals.white_noise(24576, 2, 24)
    fast = encode(pcm, 24, 96000, preset=4, backend="tpu")
    _, out = decode(fast)
    assert np.array_equal(out, pcm)


def test_fast_path_mono_preset0():
    pcm = signals.sine(24576, 1, 16)
    fast = encode(pcm, 16, 44100, preset=0, backend="tpu")
    _, out = decode(fast)
    assert np.array_equal(out, pcm)


def test_fast_path_variable_blocks():
    pcm = signals.chirp(32768, 2, 16)
    fast = encode(pcm, 16, 44100, preset=4, variable_divisions=2,
                  backend="tpu")
    _, out = decode(fast)
    assert np.array_equal(out, pcm)


@pytest.mark.parametrize("P", [1, 3])
def test_fast_path_ltp_lossless(P):
    import os

    sr = 44100
    t = np.arange(sr * 3) / sr
    sig = (9000 * np.sign(np.sin(2 * np.pi * 220 * t))).astype(np.int32)
    pcm = np.stack([sig, np.roll(sig, 3)])
    exact = encode(pcm, 16, sr, preset=4, ltp_order=P, backend="exact")
    os.environ["SRLA_TPU_HOST_SHARE"] = "0"  # exercise the device path
    try:
        fast = encode(pcm, 16, sr, preset=4, ltp_order=P, backend="tpu")
    finally:
        del os.environ["SRLA_TPU_HOST_SHARE"]
    _, out = decode(fast)
    assert np.array_equal(out, pcm)
    assert len(fast) <= 1.05 * len(exact)
