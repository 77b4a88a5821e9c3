"""AIFF input support (parity with the reference wav lib's AIFF parser)."""

import glob

import numpy as np
import pytest

from srla_tpu.wavio import read_audio, read_wav

FIXDIR = "/root/reference/test/wav"


@pytest.mark.skipif(not glob.glob(f"{FIXDIR}/from_mcgill/*.aif"),
                    reason="reference AIFF fixtures unavailable")
def test_aiff_matches_wav_twin():
    w = read_wav(f"{FIXDIR}/from_mcgill/M1F1-int16-AFsp.wav")
    a = read_audio(f"{FIXDIR}/from_mcgill/M1F1-int16-AFsp.aif")
    assert a.sampling_rate == w.sampling_rate
    assert a.bits_per_sample == w.bits_per_sample
    assert np.array_equal(a.pcm, w.pcm)


@pytest.mark.skipif(not glob.glob(f"{FIXDIR}/from_mcgill/*.aif"),
                    reason="reference AIFF fixtures unavailable")
def test_aiff_roundtrip_through_codec():
    from srla_tpu import decode, encode
    a = read_audio(f"{FIXDIR}/from_mcgill/M1F1-int24-AFsp.aif")
    data = encode(a.pcm, a.bits_per_sample, a.sampling_rate, preset=2)
    _, out = decode(data)
    assert np.array_equal(out, a.pcm)
