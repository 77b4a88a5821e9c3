"""Optional LPC library functions: sanity against known identities."""

import numpy as np

from srla_tpu.dsp.lpc_extra import (autocorrelation_direct, lpc_burg,
                                    lpc_to_parcor, lpc_auxiliary_function,
                                    quantize_parcor)


def _ar2_signal(n=4000, a1=-1.2, a2=0.7, seed=0):
    rng = np.random.RandomState(seed)
    x = np.zeros(n)
    e = rng.randn(n) * 0.1
    for i in range(2, n):
        x[i] = -a1 * x[i - 1] - a2 * x[i - 2] + e[i]
    return x / np.abs(x).max()


def test_autocorr_direct_matches_numpy():
    rng = np.random.RandomState(1)
    x = rng.randn(500)
    ac = autocorrelation_direct(x, 8)
    ref = np.array([np.dot(x[:500 - k], x[k:]) for k in range(8)])
    np.testing.assert_allclose(ac, ref, rtol=1e-12)


def test_burg_recovers_ar2():
    x = _ar2_signal()
    coef = lpc_burg(x, 2)
    # model: x[n] + c0 x[n-1] + c1 x[n-2] = e[n] => c ~ (a1, a2)
    np.testing.assert_allclose(coef, [-1.2, 0.7], atol=0.08)


def test_af_refines_toward_ar2():
    # The reference seeds AF with Levinson-Durbin output; seed with Burg here.
    x = _ar2_signal()
    init = lpc_burg(x, 2)
    coef = lpc_auxiliary_function(x, 2, max_iterations=20, initial_coef=init)
    np.testing.assert_allclose(coef, [-1.2, 0.7], atol=0.08)


def test_parcor_roundtrip_stability():
    x = _ar2_signal()
    coef = lpc_burg(x, 4)
    parcor = lpc_to_parcor(coef)
    assert (np.abs(parcor) < 1.0).all()
    q = quantize_parcor(coef, 8)
    assert (np.abs(q) <= 128).all()
