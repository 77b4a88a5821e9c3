"""Pallas LPC-synthesis kernel vs the XLA scan (interpret mode on CPU).

The hardware A/B lives in tools/pallas_lpc_ab.py; this pins the integer
semantics (wrapping int32, warm-up ramp, rshift-0 INT_MIN half, fused
de-emphasis, row padding) against kernels/decode2._lpc_scan."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from srla_tpu.kernels.decode2 import _align_coefs, _lpc_scan  # noqa: E402
from srla_tpu.kernels.pallas_lpc import lpc_scan_pallas  # noqa: E402


def _mk(R, n, M, seed, big=False):
    rng = np.random.RandomState(seed)
    res = rng.randint(-(1 << 30) if big else -4000,
                      (1 << 30) if big else 4000, (R, n)).astype(np.int32)
    orders = rng.randint(0, M + 1, R).astype(np.int32)
    orders[0] = 0                       # inactive row passes through
    if R > 2:
        orders[2] = M                   # full-order row
    coefs = rng.randint(-(1 << 15), 1 << 15, (R, M)).astype(np.int32)
    rshifts = rng.randint(0, 15, R).astype(np.int32)
    rshifts[1 % R] = 0                  # the INT_MIN-half quirk row
    aligned = np.asarray(_align_coefs(jnp.asarray(coefs),
                                      jnp.asarray(orders), M))
    return res, aligned, orders, rshifts


@pytest.mark.parametrize("R,n,M", [(3, 64, 8), (130, 33, 16), (128, 64, 8)])
def test_matches_xla_scan(R, n, M):
    res, aligned, orders, rshifts = _mk(R, n, M, seed=R + n)
    want = np.asarray(_lpc_scan(jnp.asarray(res), jnp.asarray(aligned),
                                jnp.asarray(orders), jnp.asarray(rshifts),
                                n, M))
    got = np.asarray(lpc_scan_pallas(res, aligned, orders, rshifts, n, M,
                                     interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("R,n,M", [(5, 48, 8), (129, 40, 16)])
def test_matches_xla_scan_fused_deemph(R, n, M):
    res, aligned, orders, rshifts = _mk(R, n, M, seed=7 * R + n)
    rng = np.random.RandomState(99)
    dcoef = rng.randint(0, 16, R).astype(np.int32)
    dprev = rng.randint(-30000, 30000, R).astype(np.int32)
    want = np.asarray(_lpc_scan(jnp.asarray(res), jnp.asarray(aligned),
                                jnp.asarray(orders), jnp.asarray(rshifts),
                                n, M, dcoef=jnp.asarray(dcoef),
                                dprev=jnp.asarray(dprev)))
    got = np.asarray(lpc_scan_pallas(res, aligned, orders, rshifts, n, M,
                                     dcoef=dcoef, dprev=dprev,
                                     interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("chunk", [16, 40])
def test_chunked_sample_axis(chunk):
    # The production path chunks n at _CHUNK=2048 with the window/de-emph
    # state carried across grid steps in VMEM scratch; force tiny chunks so
    # the carry crosses many boundaries (incl. a warm-up ramp that spans
    # one) and a non-dividing chunk exercises the sample-axis pad.
    R, n, M = (130, 96, 16)
    res, aligned, orders, rshifts = _mk(R, n, M, seed=3)
    rng = np.random.RandomState(11)
    dcoef = rng.randint(0, 16, R).astype(np.int32)
    dprev = rng.randint(-30000, 30000, R).astype(np.int32)
    want = np.asarray(_lpc_scan(jnp.asarray(res), jnp.asarray(aligned),
                                jnp.asarray(orders), jnp.asarray(rshifts),
                                n, M, dcoef=jnp.asarray(dcoef),
                                dprev=jnp.asarray(dprev)))
    got = np.asarray(lpc_scan_pallas(res, aligned, orders, rshifts, n, M,
                                     dcoef=dcoef, dprev=dprev,
                                     interpret=True, chunk=chunk))
    np.testing.assert_array_equal(got, want)


def test_wrapping_int32_semantics():
    # Large residuals/coefs force int32 overflow in the window dot — both
    # paths must wrap identically (two's complement), not saturate.
    res, aligned, orders, rshifts = _mk(4, 32, 8, seed=5, big=True)
    want = np.asarray(_lpc_scan(jnp.asarray(res), jnp.asarray(aligned),
                                jnp.asarray(orders), jnp.asarray(rshifts),
                                32, 8))
    got = np.asarray(lpc_scan_pallas(res, aligned, orders, rshifts, 32, 8,
                                     interpret=True))
    np.testing.assert_array_equal(got, want)
