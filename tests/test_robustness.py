"""Decoder robustness: corrupted, truncated, and fuzzed streams must raise
clean errors (never crash or loop), matching the reference's failure surface."""

import numpy as np
import pytest

import signals
from srla_tpu import decode, encode


@pytest.fixture(scope="module")
def stream():
    pcm = signals.chirp(20480, 2, 16)
    return pcm, encode(pcm, 16, 44100, preset=4)


def test_bitflip_detected(stream):
    _, data = stream
    for pos in (40, 1000, len(data) // 2, len(data) - 10):
        d = bytearray(data)
        d[pos] ^= 0x10
        with pytest.raises(ValueError):
            decode(bytes(d))


def test_truncation(stream):
    _, data = stream
    # Mid-block cuts raise; a clean cut right after the header decodes to
    # silence (reference semantics: stop at the end of available blocks).
    for cut in (100, len(data) // 3):
        with pytest.raises(ValueError):
            decode(data[:cut])
    hdr, out = decode(data[:30])
    assert not out.any()


def test_bad_header(stream):
    _, data = stream
    with pytest.raises(ValueError):
        decode(b"XXXX" + data[4:])
    d = bytearray(data)
    d[4:8] = (99).to_bytes(4, "big")  # wrong format version
    with pytest.raises(ValueError):
        decode(bytes(d))


def test_random_garbage():
    rng = np.random.RandomState(0)
    for i in range(5):
        blob = rng.bytes(4096)
        with pytest.raises(ValueError):
            decode(b"1249" + blob)


def test_no_checksum_check_decodes_corrupt(stream):
    pcm, data = stream
    d = bytearray(data)
    d[len(data) // 2] ^= 0xFF
    hdr, out = decode(bytes(d), check_checksum=False)
    assert out.shape == pcm.shape  # decodes, possibly with wrong samples


@pytest.mark.parametrize("C", [3, 5, 7])
def test_odd_channel_counts_roundtrip(C):
    pcm = signals.white_noise(12288, C, 16)
    data = encode(pcm, 16, 44100, preset=2)
    _, out = decode(data)
    assert np.array_equal(out, pcm)
