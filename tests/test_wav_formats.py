"""WAV container formats beyond plain 16-byte PCMWAVEFORMAT: 32-bit PCM,
WAVEFORMATEXTENSIBLE headers, and rejection of non-PCM subformats
(reference parity: libs/wav/src/wav.c:136-284)."""

import struct

import numpy as np
import pytest

from srla_tpu.wavio import WavData, read_wav, write_wav

PCM_GUID = (b"\x01\x00\x00\x00\x00\x00\x10\x00"
            b"\x80\x00\x00\xaa\x00\x38\x9b\x71")
FLOAT_GUID = b"\x03" + PCM_GUID[1:]


def _wav_bytes(pcm, rate, bps, fmt_size=16, tag=None, guid=PCM_GUID,
               cb_size=22):
    nch, n = pcm.shape
    nbytes = bps // 8
    inter = pcm.T.astype(np.int64)
    if bps == 8:
        inter = (inter + 128) & 0xFF
    else:
        inter = inter & ((np.int64(1) << bps) - 1)
    out = np.zeros((n, nch, nbytes), dtype=np.uint8)
    for b in range(nbytes):
        out[:, :, b] = (inter >> (8 * b)) & 0xFF
    payload = out.tobytes()
    if tag is None:
        tag = 0xFFFE if fmt_size == 40 else 1
    fmt = struct.pack("<HHIIHH", tag, nch, rate, rate * nch * nbytes,
                      nch * nbytes, bps)
    if fmt_size >= 18:
        fmt += struct.pack("<H", cb_size if fmt_size == 40 else 0)
    if fmt_size == 40:
        fmt += struct.pack("<HI", bps, (1 << nch) - 1) + guid
    assert len(fmt) == fmt_size
    return (b"RIFF" + struct.pack("<I", 20 + fmt_size + len(payload))
            + b"WAVE" + b"fmt " + struct.pack("<I", fmt_size) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)


@pytest.fixture
def pcm16():
    rng = np.random.RandomState(7)
    return rng.randint(-30000, 30000, size=(2, 4096)).astype(np.int32)


def test_extensible_header_parses(tmp_path, pcm16):
    p = tmp_path / "ext.wav"
    p.write_bytes(_wav_bytes(pcm16, 44100, 16, fmt_size=40))
    wav = read_wav(str(p))
    assert wav.bits_per_sample == 16 and wav.sampling_rate == 44100
    assert np.array_equal(wav.pcm, pcm16)


def test_waveformatex_18_parses(tmp_path, pcm16):
    p = tmp_path / "ex18.wav"
    p.write_bytes(_wav_bytes(pcm16, 48000, 16, fmt_size=18))
    wav = read_wav(str(p))
    assert np.array_equal(wav.pcm, pcm16)


def test_32bit_pcm_reads(tmp_path):
    rng = np.random.RandomState(3)
    pcm = rng.randint(-(1 << 30), 1 << 30, size=(1, 2048)).astype(np.int32)
    p = tmp_path / "s32.wav"
    p.write_bytes(_wav_bytes(pcm, 44100, 32))
    wav = read_wav(str(p))
    assert wav.bits_per_sample == 32
    assert np.array_equal(wav.pcm, pcm)


def test_32bit_write_read_roundtrip(tmp_path):
    rng = np.random.RandomState(4)
    pcm = rng.randint(-(1 << 31), 1 << 31, size=(2, 1024),
                      dtype=np.int64).astype(np.int32)
    p = tmp_path / "rt32.wav"
    write_wav(str(p), WavData(pcm, 96000, 32))
    wav = read_wav(str(p))
    assert np.array_equal(wav.pcm, pcm) and wav.sampling_rate == 96000


def test_float_tag_rejected(tmp_path, pcm16):
    p = tmp_path / "f32.wav"
    p.write_bytes(_wav_bytes(pcm16, 44100, 16, tag=3))
    with pytest.raises(ValueError, match="format tag"):
        read_wav(str(p))


def test_extensible_float_guid_rejected(tmp_path, pcm16):
    p = tmp_path / "extf.wav"
    p.write_bytes(_wav_bytes(pcm16, 44100, 16, fmt_size=40, guid=FLOAT_GUID))
    with pytest.raises(ValueError, match="subformat"):
        read_wav(str(p))


def test_bad_cbsize_rejected(tmp_path, pcm16):
    p = tmp_path / "cb.wav"
    p.write_bytes(_wav_bytes(pcm16, 44100, 16, fmt_size=40, cb_size=20))
    with pytest.raises(ValueError, match="EXTENSIBLE"):
        read_wav(str(p))


def test_extensible_encodes_like_plain(tmp_path, pcm16):
    """The codec must treat an extensible-container WAV identically to the
    same samples in a plain container."""
    from srla_tpu import encode
    plain = encode(pcm16, 16, 44100, preset=2)
    p = tmp_path / "ext2.wav"
    p.write_bytes(_wav_bytes(pcm16, 44100, 16, fmt_size=40))
    wav = read_wav(str(p))
    assert encode(wav.pcm, wav.bits_per_sample, wav.sampling_rate,
                  preset=2) == plain
