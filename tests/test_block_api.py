"""Block-level public API parity (SRLAEncoder_EncodeBlock etc.)."""

import numpy as np

import signals
from srla_tpu.decoder import SRLADecoder
from srla_tpu.encoder import EncodeParameter, SRLAEncoder
from srla_tpu.format import StreamHeader


def _enc(ch=2, preset=4, V=0, B=4096):
    return SRLAEncoder(EncodeParameter(
        num_channels=ch, bits_per_sample=16, sampling_rate=44100,
        preset=preset, max_num_samples_per_block=B,
        min_num_samples_per_block=B >> V, num_lookahead_samples=4 * B))


def _header(ch=2, n=4096, preset=4):
    return StreamHeader(ch, n, 44100, 16, 0, 4096, preset)


def test_encode_block_roundtrip():
    enc = _enc()
    pcm = signals.chirp(4096, 2, 16)
    blk = enc.encode_block(pcm)
    dec = SRLADecoder()
    out, consumed = dec.decode_block(blk, _header())
    assert consumed == len(blk)
    assert np.array_equal(out, pcm)


def test_compute_block_size_matches_encode():
    enc = _enc()
    pcm = signals.gaussian_noise(4096, 2, 16)
    assert enc.compute_block_size(pcm) == len(enc.encode_block(pcm))


def test_silent_and_raw_blocks():
    enc = _enc()
    silent = enc.encode_block(np.zeros((2, 4096), np.int32))
    assert len(silent) == 11
    noisy = (np.random.RandomState(0).randint(-2**15, 2**15, (2, 4096))
             .astype(np.int32))
    blk = enc.encode_block(noisy)
    dec = SRLADecoder()
    out, _ = dec.decode_block(blk, _header())
    assert np.array_equal(out, noisy)


def test_optimal_partitioned_block():
    enc = _enc(V=2)
    pcm = signals.chirp(16384, 2, 16)
    data = enc.encode_optimal_partitioned_block(pcm)
    dec = SRLADecoder()
    header = _header(n=16384)
    off = 0
    chunks = []
    while off < len(data):
        out, consumed = dec.decode_block(data[off:], header)
        chunks.append(out)
        off += consumed
    assert np.array_equal(np.concatenate(chunks, axis=1), pcm)
