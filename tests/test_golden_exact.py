"""Golden byte-exactness: our encoder must emit the reference's exact bytes,
and our decoder must losslessly decode reference streams.

This is the codec's correctness oracle (mirrors the reference's own
whole-pipeline property suite, test/srla_encode_decode/main.cpp, extended with
a byte-compare against the reference binary).
"""

import numpy as np
import pytest

import signals
from reference import ref_encode, reference_available
from srla_tpu import decode, encode

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference binary unavailable")

N = 20480

CASES = [
    # (name, signal, ch, bps, kwargs)
    ("silence_p0", "silence", 1, 16, dict(preset=0)),
    ("sine_p0", "sine", 1, 16, dict(preset=0)),
    ("noise_p2", "white_noise", 1, 16, dict(preset=2)),
    ("quiet_p2", "quiet_noise", 1, 16, dict(preset=2)),
    ("sine_p4", "sine", 1, 16, dict(preset=4)),
    ("chirp_p4", "chirp", 1, 16, dict(preset=4)),
    ("const_p4", "positive_constant", 1, 16, dict(preset=4)),
    ("negconst_p4", "negative_constant", 1, 16, dict(preset=4)),
    ("nyquist_p4", "nyquist_osc", 1, 16, dict(preset=4)),
    ("impulse_p4", "tiny_impulse", 1, 16, dict(preset=4)),
    ("gauss_p6", "gaussian_noise", 1, 16, dict(preset=6)),
    ("lshift_p4", "lshifted_sine", 1, 16, dict(preset=4)),
    ("stereo_sine_p2", "sine", 2, 16, dict(preset=2)),
    ("stereo_flip_p4", "sign_flipped_sine", 2, 16, dict(preset=4)),
    ("stereo_noise_p4", "white_noise", 2, 16, dict(preset=4)),
    ("8ch_noise_p2", "white_noise", 8, 16, dict(preset=2)),
    ("8bit_noise_p2", "white_noise", 1, 8, dict(preset=2)),
    ("24bit_sine_p4", "sine", 1, 24, dict(preset=4)),
    ("24bit_stereo_p4", "white_noise", 2, 24, dict(preset=4)),
    ("ltp_p4_P3", "pitchy", 1, 16, dict(preset=4, ltp_order=3)),
    ("ltp_p4_P1", "pitchy", 1, 16, dict(preset=4, ltp_order=1)),
    ("ltp_stereo_P3", "pitchy", 2, 16, dict(preset=4, ltp_order=3)),
    ("vblock_sine_V2", "sine", 1, 16, dict(preset=2, variable_divisions=2)),
    ("vblock_noise_V2", "white_noise", 1, 16, dict(preset=4,
                                                   variable_divisions=2)),
    ("vblock_stereo_ltp", "pitchy", 2, 16, dict(preset=4,
                                                variable_divisions=2,
                                                ltp_order=3)),
    ("b8192_gauss_p6", "gaussian_noise", 2, 16, dict(preset=6,
                                                     max_block=8192)),
    ("b2048_sine_p2", "sine", 1, 16, dict(preset=2, max_block=2048)),
]


def _make(name, ch, bps, n=N):
    # The reference WAV parser rejects files smaller than its 32 KiB buffer.
    if ch * n * (bps // 8) < 33000:
        n = 33000 // (ch * (bps // 8)) + 4096
    return signals.ALL[name](n, ch, bps)


@pytest.mark.parametrize("name,sig,ch,bps,kwargs",
                         CASES, ids=[c[0] for c in CASES])
def test_byte_exact(name, sig, ch, bps, kwargs):
    pcm = _make(sig, ch, bps)
    B = kwargs.get("max_block", 4096)
    V = kwargs.get("variable_divisions", 0)
    P = kwargs.get("ltp_order", 0)
    ref = ref_encode(pcm, bps, 44100, preset=kwargs["preset"], B=B, V=V, P=P)
    mine = encode(pcm, bps, 44100, **kwargs)
    assert mine == ref, (
        f"{name}: stream mismatch (len {len(mine)} vs {len(ref)})")
    hdr, out = decode(ref)
    assert np.array_equal(out, pcm), f"{name}: decode of ref stream not lossless"


def test_partial_tail_block():
    pcm = signals.sine(20000, 1, 16)  # tail of 3616 samples
    ref = ref_encode(pcm, 16, 44100, preset=2)
    assert encode(pcm, 16, 44100, preset=2) == ref


@pytest.mark.parametrize("n,ch,ltp", [
    (4096 * 4 + 4095, 1, 0), (4096 * 4 + 2047, 2, 0), (4096 * 4 + 333, 2, 3),
])
def test_odd_tail_blocks(n, ch, ltp):
    """Odd-length tails exercise the reference's stale work-buffer semantics
    (the Welch window leaves the middle sample unwritten)."""
    sig = "pitchy" if ltp else "gaussian_noise"
    pcm = signals.ALL[sig](n, ch, 16)
    ref = ref_encode(pcm, 16, 44100, preset=4, P=ltp)
    mine = encode(pcm, 16, 44100, preset=4, ltp_order=ltp)
    assert mine == ref


def test_vblock_odd_length_file():
    """Variable-block search over an odd-length file exercises work-buffer
    state threading through the search DAG."""
    pcm = signals.gaussian_noise(4096 * 5 + 1357, 2, 16)
    ref = ref_encode(pcm, 16, 44100, preset=4, V=2)
    mine = encode(pcm, 16, 44100, preset=4, variable_divisions=2)
    assert mine == ref


def test_svr_refinement():
    pcm = signals.gaussian_noise(16384, 2, 16)
    for it in (1, 3):
        ref = ref_encode(pcm, 16, 44100, preset=2, svr=it)
        mine = encode(pcm, 16, 44100, preset=2, svr_iterations=it)
        assert mine == ref, f"svr iterations={it} mismatch"


def test_many_presets_one_signal():
    pcm = signals.gaussian_noise(16384, 2, 16)
    for preset in range(7):
        ref = ref_encode(pcm, 16, 44100, preset=preset)
        mine = encode(pcm, 16, 44100, preset=preset)
        assert mine == ref, f"preset {preset} mismatch"
        _, out = decode(mine)
        assert np.array_equal(out, pcm)


def test_tiny_odd_span_ltp_stale_pitch():
    """Regression: -V with LTP creates tiny odd spans whose pitch detection
    reads stale work-buffer lags beyond the FFT size; the FFT's complex
    multiplies must round exactly like the reference's plain (non-FMA) form
    or the catastrophic cancellation in impulse autocorrelations amplifies
    last-ulp differences into different pitch decisions (found by fuzzing:
    constant signals, 44101 samples, -m 2 -B 2048 -V 2 -P 3)."""
    if not reference_available():
        pytest.skip("reference binary unavailable")
    for C, bits in ((2, 16), (8, 8)):
        pcm = signals.positive_constant(44101, C, bits)
        ref = ref_encode(pcm, bits, 44100, preset=2, B=2048, V=2, P=3)
        mine = encode(pcm, bits, 44100, preset=2, max_block=2048,
                      variable_divisions=2, ltp_order=3)
        assert mine == ref


def test_svr_buffer_state_odd_window():
    """Regression: the reference's SVR writes soft-thresholded residuals into
    the persistent work buffer (lpc.c:1050); odd-window stale reads must see
    them (found by fuzzing: -m 6 -B 8192 -V 1 --svr 1, odd length)."""
    if not reference_available():
        pytest.skip("reference binary unavailable")
    pcm = signals.chirp(44101, 3, 24)
    ref = ref_encode(pcm, 24, 44100, preset=6, B=8192, V=1, svr=1)
    mine = encode(pcm, 24, 44100, preset=6, max_block=8192,
                  variable_divisions=1, svr_iterations=1)
    assert mine == ref


def test_one_sample_tail_with_ltp_lossless():
    """Preset 0 analyzes even a 1-sample tail; its LTP autocorrelation is the
    degenerate size-1 FFT over stale buffer content. The REFERENCE BINARY
    SEGFAULTS on this input — we only assert our own losslessness."""
    for n in (12289, 131073):
        pcm = signals.chirp(n, 2, 16)
        for P in (1, 3):
            data = encode(pcm, 16, 44100, preset=0, max_block=4096,
                          ltp_order=P)
            _, out = decode(data)
            assert np.array_equal(out, pcm)
