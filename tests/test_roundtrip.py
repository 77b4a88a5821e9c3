"""Self round-trip property suite: encode -> decode == input, across the
signal/config matrix (no reference binary needed)."""

import numpy as np
import pytest

import signals
from srla_tpu import decode, encode

MATRIX = [(ch, bps) for ch in (1, 2, 8) for bps in (8, 16, 24)]


@pytest.mark.parametrize("ch,bps", MATRIX)
@pytest.mark.parametrize("preset", [0, 2, 4])
def test_roundtrip_noise(ch, bps, preset):
    pcm = signals.white_noise(12288, ch, bps)
    data = encode(pcm, bps, 44100, preset=preset)
    _, out = decode(data)
    assert np.array_equal(out, pcm)


@pytest.mark.parametrize("name", sorted(signals.ALL))
def test_roundtrip_all_signals(name):
    pcm = signals.ALL[name](10240, 2, 16)
    data = encode(pcm, 16, 44100, preset=4)
    _, out = decode(data)
    assert np.array_equal(out, pcm)


def test_roundtrip_variable_blocks():
    pcm = signals.chirp(20480, 2, 16)
    data = encode(pcm, 16, 44100, preset=4, variable_divisions=2)
    _, out = decode(data)
    assert np.array_equal(out, pcm)


def test_roundtrip_ltp():
    pcm = signals.pitchy(16384, 2, 16)
    data = encode(pcm, 16, 44100, preset=4, ltp_order=3)
    _, out = decode(data)
    assert np.array_equal(out, pcm)


def test_roundtrip_odd_length():
    pcm = signals.sine(10001, 1, 16)
    data = encode(pcm, 16, 44100, preset=2)
    _, out = decode(data)
    assert np.array_equal(out, pcm)
