"""Deterministic test waveform generators (mirroring the reference suite's
coverage classes: silence, sines, noise, chirp, constants, Nyquist, impulse)."""

import numpy as np


def _amp(bps):
    return (1 << (bps - 1)) - 1


def silence(n, ch, bps):
    return np.zeros((ch, n), dtype=np.int32)


def sine(n, ch, bps, freq=440.0, rate=44100.0):
    t = np.arange(n) / rate
    x = np.sin(2 * np.pi * freq * t) * 0.6 * _amp(bps)
    return np.tile(np.round(x).astype(np.int32), (ch, 1))


def sign_flipped_sine(n, ch, bps):
    base = sine(n, 1, bps)[0]
    out = np.stack([base * (1 if c % 2 == 0 else -1) for c in range(ch)])
    return out.astype(np.int32)


def white_noise(n, ch, bps, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.uniform(-1, 1, size=(ch, n)) * 0.8 * _amp(bps)
    return np.round(x).astype(np.int32)


def quiet_noise(n, ch, bps, seed=1):
    rng = np.random.RandomState(seed)
    x = rng.uniform(-1, 1, size=(ch, n)) * 3.0
    return np.round(x).astype(np.int32)


def chirp(n, ch, bps, rate=44100.0):
    t = np.arange(n) / rate
    x = np.sin(2 * np.pi * (20 + 4000 * t) * t) * 0.5 * _amp(bps)
    return np.tile(np.round(x).astype(np.int32), (ch, 1))


def positive_constant(n, ch, bps):
    return np.full((ch, n), _amp(bps), dtype=np.int32)


def negative_constant(n, ch, bps):
    return np.full((ch, n), -(1 << (bps - 1)), dtype=np.int32)


def nyquist_osc(n, ch, bps):
    x = np.where(np.arange(n) % 2 == 0, _amp(bps), -(1 << (bps - 1)))
    return np.tile(x.astype(np.int32), (ch, 1))


def gaussian_noise(n, ch, bps, seed=2):
    rng = np.random.RandomState(seed)
    x = np.clip(rng.randn(ch, n) * 0.2, -1, 1) * _amp(bps)
    return np.round(x).astype(np.int32)


def tiny_impulse(n, ch, bps):
    x = np.zeros((ch, n), dtype=np.int32)
    x[:, n // 2] = 4
    return x


def pitchy(n, ch, bps, rate=44100.0):
    """Strong periodicity at ~200 Hz to exercise the LTP path."""
    period = int(rate / 200)
    t = np.arange(n)
    saw = ((t % period) / period * 2 - 1) * 0.5 * _amp(bps)
    return np.tile(np.round(saw).astype(np.int32), (ch, 1))


def lshifted_sine(n, ch, bps, shift=3):
    """Samples with common trailing zero bits (exercises offset_lshift)."""
    x = sine(n, ch, bps)
    return ((x >> shift) << shift).astype(np.int32)


ALL = {
    "silence": silence,
    "sine": sine,
    "sign_flipped_sine": sign_flipped_sine,
    "white_noise": white_noise,
    "quiet_noise": quiet_noise,
    "chirp": chirp,
    "positive_constant": positive_constant,
    "negative_constant": negative_constant,
    "nyquist_osc": nyquist_osc,
    "gaussian_noise": gaussian_noise,
    "tiny_impulse": tiny_impulse,
    "pitchy": pitchy,
    "lshifted_sine": lshifted_sine,
}
