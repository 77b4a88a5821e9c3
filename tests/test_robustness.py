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


def _frame_raw_block(nsamples, payload):
    import struct

    from srla_tpu.fletcher import fletcher16
    body = struct.pack(">BH", 2, nsamples) + payload
    ck = fletcher16(body)
    return struct.pack(">HIH", 0xFFFF, len(payload) + 5, ck) + body


def test_short_raw_payload_rejected(stream):
    """A RAW block claiming more samples than its payload holds must error,
    not read out of bounds (reference: srla_decoder.c:389)."""
    _, data = stream
    hdr = bytearray(data[:30])
    # Claim 4096 samples but supply an empty payload.
    forged = bytes(hdr) + _frame_raw_block(4096, b"")
    for be in ("native", "python"):
        with pytest.raises(ValueError):
            decode(forged)


def test_bad_header_fields_rejected(stream):
    _, data = stream
    for patch in (
        (22, (0).to_bytes(2, "big")),    # bits_per_sample = 0
        (22, (64).to_bytes(2, "big")),   # bits_per_sample = 64
        (24, bytes([40])),               # offset_lshift >= 32
        (25, (0).to_bytes(4, "big")),    # max block samples = 0
    ):
        d = bytearray(data)
        off, val = patch
        d[off:off + len(val)] = val
        with pytest.raises(ValueError):
            decode(bytes(d), check_checksum=False)


def test_oversized_porder_rejected(stream):
    """porder > 10 in the residual section is corruption; both decoders must
    reject it instead of shifting by an unbounded count."""
    import struct

    from srla_tpu.bitio import BitWriter
    from srla_tpu.fletcher import fletcher16
    _, data = stream
    hdr = data[:30]
    bps = 16
    w = BitWriter()
    w.put(0, 2)                    # stereo method NONE
    for _ in range(2):             # per channel: preemph prev + coef
        w.put(0, bps + 1)
        w.put(0, 5)
    for _ in range(2):             # per channel: order 0, rshift 0, use_sum
        w.put(0, 8)
        w.put(0, 4)
        w.put(0, 1)
    for _ in range(2):             # LTP disabled
        w.put(0, 1)
    # Residual section channel 0: code type RICE, porder = 1023.
    w.put(0, 2)
    w.put(1023, 10)
    w.put(0xFFFFFFFF, 32)          # junk
    payload = w.getvalue()
    body = struct.pack(">BH", 0, 4096) + payload
    ck = fletcher16(body)
    forged = hdr + struct.pack(">HIH", 0xFFFF, len(payload) + 5, ck) + body
    with pytest.raises(ValueError):
        decode(forged)
