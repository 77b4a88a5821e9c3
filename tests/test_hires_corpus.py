"""BASELINE config 5: 24-bit 96 kHz, B=8192, batched multi-file encode."""

import numpy as np

from srla_tpu import decode
from srla_tpu.encoder import encode_files


def _hires(n, seed):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 96000.0
    sig = (np.sin(2 * np.pi * 440 * t) * 0.4
           + np.sin(2 * np.pi * 880 * t + 0.3) * 0.15
           + rng.randn(n) * 0.01)
    l = np.round(sig * (2 ** 22)).astype(np.int32)
    r = np.round(np.roll(sig, 13) * (2 ** 22) * 0.95).astype(np.int32)
    return np.stack([l, r])


def test_multi_file_hires_batch():
    files = [_hires(96000 // 2, s) for s in range(3)]
    streams = encode_files(files, 24, 96000, preset=4, max_block=8192,
                           backend="tpu")
    for pcm, stream in zip(files, streams):
        hdr, out = decode(stream)
        assert hdr.bits_per_sample == 24
        assert hdr.max_num_samples_per_block == 8192
        assert np.array_equal(out, pcm)


def test_multi_file_matches_single_file_exact():
    files = [_hires(96000 // 3, s) for s in range(2)]
    from srla_tpu import encode
    streams = encode_files(files, 24, 96000, preset=2, backend="exact")
    for pcm, stream in zip(files, streams):
        assert stream == encode(pcm, 24, 96000, preset=2)
