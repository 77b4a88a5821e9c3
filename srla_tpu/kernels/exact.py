"""Bit-exact device encode analysis (df64 double-float + boundary flagging).

The f32 fast path (kernels/encode.py) admits parameter choices that differ
from the exact f64 host pipeline. This module re-derives the SAME decisions on
device using double-float (two-f32) arithmetic (kernels/df64.py, ~2^-48
relative accuracy) and, for every discrete decision the float analysis feeds
(pre-emphasis coefficient rounding, LPC order argmin, coefficient
quantization rounding + frexp shift, Rice parameter boundaries, recursive/
plain selection, silent thresholds), computes the distance to the nearest
decision boundary. A variant whose distance anywhere falls below a safety
margin — chosen orders of magnitude above the df64-vs-f64 discrepancy bound,
scaled by a per-variant conditioning estimate — is flagged `risky`; the
encoder re-derives flagged blocks on the exact host path. Unflagged variants
provably make the same decisions as the host oracle, so the emitted stream is
byte-identical to the reference and deterministic.

All downstream residual/bit math is exact wrapping-int32 (shared with
kernels/encode.py). Decision parity targets (reference):
libs/lpc/src/lpc.c:330-441 (autocorr+Levinson), :535-570, :1341-1405
(quantize), libs/srla_coder/src/srla_coder.c:262-324 (Rice parameters),
libs/srla_internal/src/srla_utility.c:206-257 (pre-emphasis).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (CODER_LOG2_MAX_NUM_PARTITIONS,
                         LPC_COEFFICIENT_BITWIDTH,
                         LPC_RIDGE_REGULARIZATION_PARAMETER,
                         PREEMPHASIS_COEF_SHIFT,
                         RSHIFT_LPC_COEFFICIENT_BITWIDTH)
from ..dsp.window import welch_inverse_squared_sum, welch_window
from ..rice import MLNOPTX, OPTX, _INV_LOGE2, _LOG_OPTX
from . import df64 as dd
from .encode import _predict, _reverse_coefs, _zigzag

FLT_EPSILON = 1.1920928955078125e-07

# Safety margins. df64-vs-f64 discrepancies are ~2^-44 relative (amplified by
# the conditioning factor kappa where noted); margins sit >=100x above that
# and ~10x above the host's own vectorized-libm tie-repair thresholds, so an
# unflagged decision is the same in both pipelines.
_EPS_PREEMPH = 1e-8          # |16*r1/r0| distance to rounding half-boundary
_EPS_RICE_LOG = 1e-8         # |log2v| distance to round-half boundary
_EPS_RICE_TRUNC = 1e-9       # relative distance to k2 truncation boundary
_EPS_RICE_MEAN2 = 1e-9       # |mean - 2| recursive/plain selection
_EPS_SILENT = 1e-6           # relative |r0| distance to FLT_EPSILON
_EPS_ORDER_BASE = 1e-6       # bits; matches the host tie-repair trigger
_EPS_QUANT_BASE = 1e-7       # quantized-units distance to rounding boundary
_KAPPA_SCALE = np.float32(2.0 ** -40)  # conditioning amplification allowance


def _dd_const(v):
    return dd.const(float(v))


def _dist_to_half(x):
    """Distance of df value x to the nearest (k + 0.5) rounding boundary of
    round-half-away-from-zero, evaluated on |x| (boundaries are symmetric)."""
    ax = dd.abs_(x)
    fr = dd.sub(ax, dd.floor(ax))
    return jnp.abs(dd.to_f32(fr) - np.float32(0.5))


def _dist_to_int(x):
    """Distance of df value x to the nearest integer (truncation boundary)."""
    fr = dd.sub(x, dd.floor(x))
    f = dd.to_f32(fr)
    return jnp.minimum(f, 1.0 - f)


# ---------------------------------------------------------------------------
# Pre-emphasis (exact decision + exact int32 filter)
# ---------------------------------------------------------------------------

def _preemphasis_exact(sig: jnp.ndarray):
    """sig: (V, n) int32. Returns (work int32, coef int32, risky bool)."""
    x = dd.from_int32(sig)
    r0 = dd.sum_pairwise(dd.mul(x, x), axis=1)
    x0 = (x[0][:, :-1], x[1][:, :-1])
    x1 = (x[0][:, 1:], x[1][:, 1:])
    r1 = dd.sum_pairwise(dd.mul(x0, x1), axis=1)
    zero = (r0[0] == 0) & (r0[1] == 0)
    safe_r0 = (jnp.where(zero, 1.0, r0[0]), jnp.where(zero, 0.0, r0[1]))
    dc16 = dd.mul_pow2(dd.div(r1, safe_r0), float(1 << PREEMPHASIS_COEF_SHIFT))
    q = dd.to_f32(dd.round_half_away(dc16))
    coef = jnp.clip(q, -(1 << PREEMPHASIS_COEF_SHIFT),
                    (1 << PREEMPHASIS_COEF_SHIFT) - 1).astype(jnp.int32)
    coef = jnp.where(zero, 0, coef)
    risky = (_dist_to_half(dc16) < _EPS_PREEMPH) & ~zero
    prev = jnp.concatenate([sig[:, :1], sig[:, :-1]], axis=1)
    pred = (prev * coef[:, None]) >> PREEMPHASIS_COEF_SHIFT
    return sig - pred, coef, risky


# ---------------------------------------------------------------------------
# Windowed circular autocorrelation (df64 direct-lag; value-accurate, the
# reference's FFT path is only ever consumed through flagged decisions)
# ---------------------------------------------------------------------------

def _autocorr_dd(work: jnp.ndarray, n: int, bps: int, order: int,
                 fft_size: int):
    """work: (V, n) int32. Returns df (V, order) matching the host
    autocorr_fft value (circular over the zero-padded pow2 buffer, scaled by
    fft_size/n) to ~2^-44 relative accuracy. Odd n: the Welch window's
    unwritten middle sample is taken as 0 (the stale-state-free case; the
    encoder routes stale-state-dependent blocks to the host)."""
    win = welch_window(n).copy()
    if n & 1:
        win[n // 2] = 0.0
    wn_hi, wn_lo = dd.split_f64(win * 2.0 ** (-(bps - 1)))
    d = dd.mul(dd.from_int32(work), (jnp.asarray(wn_hi)[None, :],
                                     jnp.asarray(wn_lo)[None, :]))
    V = work.shape[0]
    F = fft_size
    pad = F - n
    dh = jnp.pad(d[0], ((0, 0), (0, pad)))
    dl = jnp.pad(d[1], ((0, 0), (0, pad)))
    d2h = jnp.concatenate([dh, dh], axis=1)
    d2l = jnp.concatenate([dl, dl], axis=1)
    norm = dd.const(float(F) / float(n))

    def body(k, ac):
        rh = jax.lax.dynamic_slice_in_dim(d2h, k, F, axis=1)
        rl = jax.lax.dynamic_slice_in_dim(d2l, k, F, axis=1)
        s = dd.sum_pairwise(dd.mul((dh, dl), (rh, rl)), axis=1)
        s = dd.mul(s, norm)
        ach = jax.lax.dynamic_update_slice_in_dim(ac[0], s[0][:, None], k,
                                                  axis=1)
        acl = jax.lax.dynamic_update_slice_in_dim(ac[1], s[1][:, None], k,
                                                  axis=1)
        return (ach, acl)

    ac0 = (jnp.zeros((V, order), jnp.float32), jnp.zeros((V, order),
                                                         jnp.float32))
    return jax.lax.fori_loop(0, order, body, ac0)


# ---------------------------------------------------------------------------
# Levinson-Durbin in df64 (structure mirrors kernels/encode.py:_levinson)
# ---------------------------------------------------------------------------

def _levinson_dd(ac, max_order: int, orders=None):
    """ac: df (V, M+1) (ridge already applied to lag 0). Returns
    (error_vars df (V, M+1), coefs df (V, M) at per-variant `orders` or None,
    silent bool (V,), risky bool (V,))."""
    V = ac[0].shape[0]
    M = max_order
    r0 = (ac[0][:, 0], ac[1][:, 0])
    zero_r0 = (r0[0] == 0) & (r0[1] == 0)
    sr0 = (jnp.where(zero_r0, 1.0, r0[0]), jnp.where(zero_r0, 0.0, r0[1]))

    def zeros(shape):
        return (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))

    def put(x, col, val):
        return (x[0].at[:, col].set(val[0]), x[1].at[:, col].set(val[1]))

    def col(x, c):
        return (x[0][:, c], x[1][:, c])

    a = zeros((V, M + 2))
    a = put(a, 0, (jnp.ones(V, jnp.float32), jnp.zeros(V, jnp.float32)))
    ac1 = col(ac, 1)
    a1 = dd.div(dd.neg(ac1), sr0)
    a = put(a, 1, a1)
    ev = zeros((V, M + 1))
    ev = put(ev, 0, r0)
    ev1 = dd.add(r0, dd.mul(ac1, a1))
    ev = put(ev, 1, ev1)
    collect = orders is not None
    collected = zeros((V, M))
    if collect:
        sel = (orders == 1)[:, None]
        first_h = jnp.pad(a1[0][:, None], ((0, 0), (0, M - 1)))
        first_l = jnp.pad(a1[1][:, None], ((0, 0), (0, M - 1)))
        collected = (jnp.where(sel, first_h, collected[0]),
                     jnp.where(sel, first_l, collected[1]))

    # acflip_pad[j] = ac[M+1-j] for j <= M+1, 0 beyond (per plane).
    def flip_pad(x, width):
        xe = jnp.pad(x, ((0, 0), (0, 1)))
        return jnp.pad(xe[:, ::-1], ((0, 0), (0, width)))

    acf = (flip_pad(ac[0], M + 2), flip_pad(ac[1], M + 2))
    aidx = jnp.arange(M + 2)

    def body(k, carry):
        a, ev, collected = carry
        winh = jax.lax.dynamic_slice_in_dim(acf[0], M - k - 1, M + 2, axis=1)
        winl = jax.lax.dynamic_slice_in_dim(acf[1], M - k - 1, M + 2, axis=1)
        gamma = dd.sum_pairwise(dd.mul(a, (winh, winl)), axis=1)
        evkh = jax.lax.dynamic_slice_in_dim(ev[0], k + 1, 1, axis=1)[:, 0]
        evkl = jax.lax.dynamic_slice_in_dim(ev[1], k + 1, 1, axis=1)[:, 0]
        zero_ev = (evkh == 0) & (evkl == 0)
        sev = (jnp.where(zero_ev, 1.0, evkh), jnp.where(zero_ev, 0.0, evkl))
        gamma = dd.div(gamma, dd.neg(sev))
        one = dd.one_like(gamma[0])
        ev_next = dd.mul((evkh, evkl), dd.sub(one, dd.mul(gamma, gamma)))
        ev = (jax.lax.dynamic_update_slice_in_dim(
                  ev[0], ev_next[0][:, None], k + 2, axis=1),
              jax.lax.dynamic_update_slice_in_dim(
                  ev[1], ev_next[1][:, None], k + 2, axis=1))
        arevh = jax.lax.dynamic_slice_in_dim(
            jnp.pad(a[0][:, ::-1], ((0, 0), (0, M + 2))), M - k - 1, M + 2,
            axis=1)
        arevl = jax.lax.dynamic_slice_in_dim(
            jnp.pad(a[1][:, ::-1], ((0, 0), (0, M + 2))), M - k - 1, M + 2,
            axis=1)
        a_new = dd.add(a, dd.mul((gamma[0][:, None], gamma[1][:, None]),
                                 (arevh, arevl)))
        live = (aidx <= k + 2)[None, :]
        a_new = (jnp.where(live, a_new[0], 0.0), jnp.where(live, a_new[1],
                                                           0.0))
        if collect:
            sel = (orders == (k + 2))[:, None]
            collected = (jnp.where(sel, a_new[0][:, 1:M + 1], collected[0]),
                         jnp.where(sel, a_new[1][:, 1:M + 1], collected[1]))
        return (a_new, ev, collected)

    if M > 1:
        a, ev, collected = jax.lax.fori_loop(0, M - 1, body,
                                             (a, ev, collected))

    absr0 = dd.to_f32(dd.abs_(r0))
    silent = absr0 < np.float32(FLT_EPSILON)
    risky = jnp.abs(absr0 - np.float32(FLT_EPSILON)) < \
        np.float32(_EPS_SILENT * FLT_EPSILON)
    evs = (jnp.where(silent[:, None], r0[0][:, None], ev[0]),
           jnp.where(silent[:, None], r0[1][:, None], ev[1]))
    if collect:
        collected = (jnp.where(silent[:, None], 0.0, collected[0]),
                     jnp.where(silent[:, None], 0.0, collected[1]))
    # Conditioning estimate: r0 / min |ev| over the recursion (ev decreasing
    # in exact arithmetic, but guard with an explicit min).
    ev_abs = jnp.abs(evs[0]) + jnp.abs(evs[1])
    min_ev = jnp.min(jnp.where(ev_abs > 0, ev_abs, jnp.inf), axis=1)
    kappa = jnp.where(silent, 1.0,
                      jnp.abs(r0[0]) / jnp.where(jnp.isfinite(min_ev)
                                                 & (min_ev > 0), min_ev, 1.0))
    kappa = jnp.where(jnp.isfinite(kappa) & (kappa >= 1.0), kappa, jnp.inf)
    nonfinite = ~(jnp.isfinite(evs[0]).all(axis=1))
    if collect:
        nonfinite = nonfinite | ~(jnp.isfinite(collected[0]).all(axis=1))
    risky = risky | (nonfinite & ~silent)
    return evs, (collected if collect else None), silent, risky, kappa


# ---------------------------------------------------------------------------
# Order selection (BRUTEFORCE_ESTIMATION) in df64
# ---------------------------------------------------------------------------

def _select_order_exact(ev, n: int, bps: int, max_params: int,
                        max_fixed: bool, kappa):
    """ev: df (V, M+1) error variances (window-energy-corrected). Returns
    (orders (V,), risky (V,)). The whole entropy chain is evaluated batched
    over (V, M) — one dd transcendental chain, not one per order — and the
    argmin runs as a fori_loop (first strict minimum wins, like np.argmin)."""
    V = ev[0].shape[0]
    if max_fixed:
        return jnp.full((V,), max_params, jnp.int32), jnp.zeros(V, bool)
    M = max_params
    one = _dd_const(1.0)
    inv_loge2 = _dd_const(_INV_LOGE2)
    nf = _dd_const(float(n))
    evo = (ev[0][:, 1:M + 1], ev[1][:, 1:M + 1])
    neg_ev = evo[0] < 0
    sev = (jnp.where(neg_ev, 0.0, evo[0]), jnp.where(neg_ev, 0.0, evo[1]))
    mabse = dd.mul_pow2(dd.sqrt(dd.mul_pow2(sev, 0.5)), 2.0)
    intmean = dd.mul_pow2(mabse, float(1 << (bps - 1)))
    rho = dd.div(one, dd.add(one, intmean))
    invrho = dd.sub(one, rho)
    # Guard logs at 0 (mabse == 0 -> ent forced to 0 below).
    z = mabse[0] < np.float32(1e-16)
    g_invrho = (jnp.where(invrho[0] <= 0, 0.5, invrho[0]),
                jnp.where(invrho[0] <= 0, 0.0, invrho[1]))
    g_rho = (jnp.where(rho[0] <= 0, 0.5, rho[0]),
             jnp.where(rho[0] <= 0, 0.0, rho[1]))
    t1 = dd.mul(invrho, dd.mul(dd.log(g_invrho), inv_loge2))
    t2 = dd.mul(rho, dd.mul(dd.log(g_rho), inv_loge2))
    ent = dd.div(dd.neg(dd.add(t1, t2)), rho)
    ent = (jnp.where(z, 0.0, ent[0]), jnp.where(z, 0.0, ent[1]))
    coef_bits = (LPC_COEFFICIENT_BITWIDTH
                 * jnp.arange(1, M + 1, dtype=jnp.float32))[None, :]
    length = dd.add(dd.mul(ent, nf),
                    (dd._pin(coef_bits), dd._pin(jnp.zeros_like(coef_bits))))
    risky = jnp.any(~neg_ev & (jnp.abs(mabse[0] - np.float32(1e-16))
                               < np.float32(1e-17)), axis=1)
    bad = neg_ev | ~jnp.isfinite(length[0])
    lh = jnp.where(bad, np.float32(np.inf), length[0])
    ll = jnp.where(bad, 0.0, length[1])

    def body(i, carry):
        best, second, orders = carry
        cand = (lh[:, i], ll[:, i])
        better = dd.lt(cand, best)
        second = (jnp.where(better, best[0], second[0]),
                  jnp.where(better, best[1], second[1]))
        closer2 = ~better & dd.lt(cand, second)
        second = (jnp.where(closer2, cand[0], second[0]),
                  jnp.where(closer2, cand[1], second[1]))
        best = (jnp.where(better, cand[0], best[0]),
                jnp.where(better, cand[1], best[1]))
        orders = jnp.where(better, i + 1, orders)
        return (best, second, orders)

    init = ((jnp.full(V, np.float32(np.inf)), jnp.zeros(V, jnp.float32)),
            (jnp.full(V, np.float32(np.inf)), jnp.zeros(V, jnp.float32)),
            jnp.ones(V, jnp.int32))
    best, second, orders = jax.lax.fori_loop(0, M, body, init)
    gap = dd.to_f32(dd.sub(second, best))
    eps = jnp.maximum(np.float32(_EPS_ORDER_BASE),
                      np.float32(n) * kappa.astype(jnp.float32) *
                      _KAPPA_SCALE)
    risky = risky | ~jnp.isfinite(best[0]) | (jnp.isfinite(gap) & (gap < eps))
    return orders, risky


# ---------------------------------------------------------------------------
# Coefficient quantization in df64
# ---------------------------------------------------------------------------

def _quantize_exact(coefs, orders, nbits: int, max_bits: int, kappa):
    """coefs: df (V, M) left-aligned. Returns (int_coefs (V, M) int32,
    rshift (V,) int32, risky (V,))."""
    V, M = coefs[0].shape
    qmax = 1 << (nbits - 1)
    mask = jnp.arange(M)[None, :] < orders[:, None]
    ac = dd.abs_(coefs)
    ach = jnp.where(mask, ac[0], 0.0)
    acl = jnp.where(mask, ac[1], 0.0)
    # Pairwise lexicographic max.
    n = 1
    while n < max(M, 1):
        n *= 2
    if n != M:
        ach = jnp.pad(ach, ((0, 0), (0, n - M)))
        acl = jnp.pad(acl, ((0, 0), (0, n - M)))
    while n > 1:
        n //= 2
        l = (ach[:, :n], acl[:, :n])
        r = (ach[:, n:], acl[:, n:])
        take_l = dd.ge(l, r)
        ach = jnp.where(take_l, l[0], r[0])
        acl = jnp.where(take_l, l[1], r[1])
    maxabs = (ach[:, 0], acl[:, 0])

    eps_k = jnp.maximum(np.float32(_EPS_QUANT_BASE),
                        np.float32(2 * qmax) * kappa.astype(jnp.float32)
                        * _KAPPA_SCALE)
    tiny_thresh = np.float32(2.0 ** (-(nbits - 1)))
    tiny = maxabs[0] + maxabs[1] <= tiny_thresh
    risky = jnp.abs((maxabs[0] - tiny_thresh) + maxabs[1]) \
        < tiny_thresh * np.float32(1e-6)
    # frexp boundary: maxabs close to a power of two flips ndigit.
    safe_hi = jnp.maximum(maxabs[0], np.float32(1e-38))
    m_hi, e_hi = jnp.frexp(safe_hi)
    scale_back = jnp.exp2(-e_hi.astype(jnp.float32))
    m_full = m_hi + maxabs[1] * scale_back
    risky = risky | (~tiny & ((jnp.abs(m_full - 0.5) < np.float32(1e-7))
                              | (m_full > np.float32(1.0 - 1e-7))))
    ndigit = e_hi - (m_full < 0.5).astype(e_hi.dtype)
    ndigit = jnp.where(maxabs[0] == 0, 0, ndigit)
    rshift = (nbits - 1) - ndigit
    rshift = jnp.where((rshift >= max_bits) | (rshift < 0), max_bits - 1,
                       rshift)
    rshift = jnp.where(tiny, nbits, rshift).astype(jnp.int32)
    scale = jnp.exp2(rshift.astype(jnp.float32))  # exact power of two

    def body(i, carry):
        qerr, intc, risky = carry
        ordi = M - 1 - i
        active = orders > ordi
        c = (coefs[0][:, ordi] * scale, coefs[1][:, ordi] * scale)
        qe = dd.add(qerr, c)
        qt = dd.to_f32(dd.round_half_away(qe))
        qt = jnp.clip(qt, -qmax, qmax - 1)
        risky = risky | (active & (_dist_to_half(qe) < eps_k))
        new_err = dd.sub(qe, (qt, jnp.zeros_like(qt)))
        qerr = (jnp.where(active, new_err[0], qerr[0]),
                jnp.where(active, new_err[1], qerr[1]))
        intc = intc.at[:, ordi].set(jnp.where(active, qt.astype(jnp.int32),
                                              0))
        return (qerr, intc, risky)

    zero = (jnp.zeros(V, jnp.float32), jnp.zeros(V, jnp.float32))
    _, intc, risky = jax.lax.fori_loop(
        0, M, body, (zero, jnp.zeros((V, M), jnp.int32), risky))
    intc = jnp.where(tiny[:, None], 0, intc)
    risky = risky | ~jnp.isfinite(maxabs[0])
    return intc, rshift, risky


# ---------------------------------------------------------------------------
# Partitioned Rice parameter search in df64 (mirrors rice.analyze_batch)
# ---------------------------------------------------------------------------

_RICE_BOUNDARIES = None


def _rice_k_boundaries():
    """Host-precomputed (f64) decision boundaries of the two Rice-parameter
    chains, expressed in PARTITION-MEAN space, as (hi, lo, eps) f32 tables of
    33 entries (index j holds boundary j for j=1..31; 0/32 are sentinels).

    Plain Rice (srla_coder.c:262-287): k = max(0, round(log2v)) with
    log2v = log2(ln OPTX / ln(1 - 1/(1+m))) — boundary j at log2v = j - 0.5.
    Recursive (c:298-324): k2 = log2floor(trunc(MLNOPTX*(1+m))) — boundary j
    at MLNOPTX*(1+m) = 2^j. Both are strictly increasing in m. eps bands
    cover the host f64 chain's rounding, its 1e-9 scalar-libm tie-repair
    trigger, and the device's dd representation error, with wide margin.
    """
    global _RICE_BOUNDARIES
    if _RICE_BOUNDARIES is not None:
        return _RICE_BOUNDARIES
    import math

    def m_of_log2v(l2v):
        v = 2.0 ** l2v
        om = math.exp(_LOG_OPTX / v)
        return om / (1.0 - om)

    BIG = 3.0e38
    kb = [-BIG]
    kb_eps = [0.0]
    tb = [-BIG]
    tb_eps = [0.0]
    for j in range(1, 32):
        m = m_of_log2v(j - 0.5)
        dm = abs(m_of_log2v(j - 0.5 + 1e-8) - m)
        kb.append(m)
        kb_eps.append(dm + m * 2.0 ** -40 + 1e-12)
        t = 2.0 ** j / MLNOPTX - 1.0
        tb.append(t)
        tb_eps.append(max(1e-9, t * 2.0 ** -38))
    kb.append(BIG)
    kb_eps.append(0.0)
    tb.append(BIG)
    tb_eps.append(0.0)
    kb_hi, kb_lo = dd.split_f64(np.asarray(kb))
    tb_hi, tb_lo = dd.split_f64(np.asarray(tb))
    _RICE_BOUNDARIES = ((kb_hi, kb_lo, np.asarray(kb_eps, np.float32)),
                        (tb_hi, tb_lo, np.asarray(tb_eps, np.float32)))
    return _RICE_BOUNDARIES


def _rice_exact(residual: jnp.ndarray, n: int, max_porder: int):
    """residual: (V, n) int32. Returns (code_type, porder, bits(+2), ks
    (V, 1 << max_porder) int32, risky)."""
    V = residual.shape[0]
    u = _zigzag(residual)
    ui = u.astype(jnp.int32)  # values < 2^31 for <=24-bit content
    max_uval = jnp.max(u, axis=1)

    # Per-level partition means (df64; leaf sums are exact integers).
    nleaf = 1 << max_porder
    nsmpl_leaf = n >> max_porder
    leaf = dd.from_int32(ui.reshape(V, nleaf, nsmpl_leaf))
    leaf_sum = dd.sum_pairwise(leaf, axis=2)
    means = [None] * (max_porder + 1)
    means[max_porder] = dd.div(leaf_sum, _dd_const(float(nsmpl_leaf)))
    for p in range(max_porder - 1, -1, -1):
        m = means[p + 1]
        means[p] = dd.mul_pow2(dd.add((m[0][:, 0::2], m[1][:, 0::2]),
                                      (m[0][:, 1::2], m[1][:, 1::2])), 0.5)

    mean_all = (means[0][0][:, 0], means[0][1][:, 0])
    two = _dd_const(2.0)
    recursive = dd.ge(mean_all, two)
    risky = jnp.abs(dd.to_f32(dd.sub(mean_all, two))) \
        < np.float32(_EPS_RICE_MEAN2)

    # Both Rice-parameter decisions are MONOTONE in the partition mean, so
    # instead of evaluating the reference's transcendental chains per
    # partition (two dd logs + divs over up-to-2047 partitions x V — the
    # dominant analysis cost), compare the dd mean against HOST-precomputed
    # f64 decision boundaries in mean-space. Flag any mean that lands within
    # the boundary's uncertainty band (host f64 chain rounding + its 1e-9
    # vectorized-libm tie-repair region + dd error, with ~30x safety).
    flat = (jnp.concatenate([means[p][0] for p in range(max_porder + 1)],
                            axis=1),
            jnp.concatenate([means[p][1] for p in range(max_porder + 1)],
                            axis=1))
    zero_mean_f = (flat[0] == 0) & (flat[1] == 0)
    (kb_hi, kb_lo, kb_eps), (tb_hi, tb_lo, tb_eps) = _rice_k_boundaries()

    def count_and_flag(b_hi, b_lo, b_eps):
        k = jnp.zeros(flat[0].shape, jnp.int32)
        for j in range(1, 32):
            bj = (jnp.float32(b_hi[j]), jnp.float32(b_lo[j]))
            k = k + dd.ge(flat, bj).astype(jnp.int32)
        # Distance to the two adjacent boundaries (sentinel-padded tables).
        bh = jnp.asarray(b_hi)[k]
        bl = jnp.asarray(b_lo)[k]
        be = jnp.asarray(b_eps)[k]
        bh2 = jnp.asarray(b_hi)[k + 1]
        bl2 = jnp.asarray(b_lo)[k + 1]
        be2 = jnp.asarray(b_eps)[k + 1]
        d1 = jnp.abs(dd.to_f32(dd.sub(flat, (bh, bl))))
        d2 = jnp.abs(dd.to_f32(dd.sub((bh2, bl2), flat)))
        flagged = ((d1 < be) | (d2 < be2) | (k >= 31)) & ~zero_mean_f
        return k, flagged

    # Plain Rice: k = max(0, round(log2(ln OPTX / ln(1 - 1/(1+m))))).
    kr_f, r_log_f = count_and_flag(kb_hi, kb_lo, kb_eps)
    # Recursive Rice: k2 = log2floor(max(1, trunc(MLNOPTX * (1+m)))).
    k2_f, r_trunc_f = count_and_flag(tb_hi, tb_lo, tb_eps)

    best_bits = jnp.full(V, jnp.int32(2 ** 30))
    best_porder = jnp.zeros(V, jnp.int32)
    MAXP = 1 << max_porder
    best_ks = jnp.zeros((V, MAXP), jnp.int32)

    off = 0
    for porder in range(max_porder + 1):
        nparts = 1 << porder
        nsmpl = n >> porder
        up = ui.reshape(V, nparts, nsmpl)
        k2 = k2_f[:, off:off + nparts]
        kr = kr_f[:, off:off + nparts]
        r_trunc = r_trunc_f[:, off:off + nparts]
        r_log = r_log_f[:, off:off + nparts]
        off += nparts
        k1pow = jnp.int32(1) << (k2 + 1)
        dver = up - k1pow[:, :, None]
        rec_bits = (jnp.sum(jnp.maximum(dver, 0) >> k2[:, :, None], axis=2)
                    + (k2 + 2) * nsmpl)
        rice_bits = (jnp.sum(up >> kr[:, :, None], axis=2)
                     + (kr + 1) * nsmpl).astype(jnp.int32)

        ks = jnp.where(recursive[:, None], k2, kr)
        part_bits = jnp.where(recursive[:, None], rec_bits, rice_bits)
        pflag = jnp.where(recursive[:, None], r_trunc, r_log)
        risky = risky | jnp.any(pflag, axis=1)
        deltas = _zigzag(ks[:, 1:] - ks[:, :-1]).astype(jnp.int32)
        bits = (CODER_LOG2_MAX_NUM_PARTITIONS + 5
                + jnp.sum(part_bits, axis=1)
                + jnp.sum(deltas + 1, axis=1)).astype(jnp.int32)
        better = bits < best_bits
        best_bits = jnp.where(better, bits, best_bits)
        best_porder = jnp.where(better, porder, best_porder)
        ks_pad = jnp.pad(ks, ((0, 0), (0, MAXP - nparts)))
        best_ks = jnp.where(better[:, None], ks_pad, best_ks)

    allzero = max_uval == 0
    code_type = jnp.where(allzero, 2,
                          jnp.where(recursive, 1, 0)).astype(jnp.int32)
    bits = jnp.where(allzero, 0, best_bits) + 2
    best_porder = jnp.where(allzero, 0, best_porder)
    risky = risky & ~allzero
    return code_type, best_porder, bits, best_ks, risky


# ---------------------------------------------------------------------------
# Full per-variant pipeline
# ---------------------------------------------------------------------------

def _analyze_core_exact(sig: jnp.ndarray, *, n: int, bps: int,
                        max_params: int, max_fixed: bool, fft_size: int,
                        max_porder: int):
    work, pre_coef, risky = _preemphasis_exact(sig)
    pre_prev = sig[:, 0]
    V = sig.shape[0]
    if max_params > 0:
        ac = _autocorr_dd(work, n, bps, max_params + 1, fft_size)
        ridge = _dd_const(1.0 + LPC_RIDGE_REGULARIZATION_PARAMETER)
        ac0 = dd.mul((ac[0][:, 0], ac[1][:, 0]), ridge)
        ac = (ac[0].at[:, 0].set(ac0[0]), ac[1].at[:, 0].set(ac0[1]))
        ev, _, silent, r_lev, kappa = _levinson_dd(ac, max_params, None)
        winv = _dd_const(welch_inverse_squared_sum(n))
        evc = dd.mul(ev, (jnp.broadcast_to(winv[0], ev[0].shape),
                          jnp.broadcast_to(winv[1], ev[1].shape)))
        orders, r_ord = _select_order_exact(evc, n, bps, max_params,
                                            max_fixed, kappa)
        _, coefs, _, _, _ = _levinson_dd(ac, max_params, orders)
        intc, rshifts, r_q = _quantize_exact(
            coefs, orders, LPC_COEFFICIENT_BITWIDTH,
            1 << RSHIFT_LPC_COEFFICIENT_BITWIDTH, kappa)
        rshifts = jnp.where(orders > 0, rshifts, 0)
        coefs_rev = _reverse_coefs(intc, orders)
        residual = _predict(work, coefs_rev, orders, rshifts, n)
        risky = risky | r_lev | r_ord | r_q
    else:
        orders = jnp.zeros(V, jnp.int32)
        rshifts = jnp.zeros(V, jnp.int32)
        coefs_rev = jnp.zeros((V, 1), jnp.int32)
        residual = work
    code_type, porder, rice_bits, ks, r_rice = _rice_exact(residual, n,
                                                           max_porder)
    risky = risky | r_rice
    return dict(pre_prev=pre_prev, pre_coef=pre_coef, orders=orders,
                rshifts=rshifts, coefs=coefs_rev, residual=residual,
                code_type=code_type, porder=porder, rice_bits=rice_bits,
                ks=ks, risky=risky,
                ltp_period=jnp.zeros(V, jnp.int32),
                ltp_coefs=jnp.zeros((V, 1), jnp.int32))


@partial(jax.jit, static_argnames=("n", "bps", "max_params", "max_fixed",
                                   "fft_size", "max_porder", "C"))
def analyze_blocks_exact(blocks: jnp.ndarray, lshift, *, n: int, bps: int,
                         max_params: int, max_fixed: bool, fft_size: int,
                         max_porder: int, C: int):
    """Exact-decision variant analysis (no LTP/SVR; the encoder routes those
    to the host until their exact device pipelines land).

    Same contract as kernels/encode.py:analyze_blocks_ex, plus
    small['risky']: variants whose decisions are too boundary-close to prove
    equal to the host's f64 pipeline and must be host-re-derived.
    """
    work = blocks.astype(jnp.int32) >> lshift
    parts = []
    if C >= 2:
        s = work[:, 1] - work[:, 0]
        m = work[:, 0] + (s >> 1)
        parts.extend([m, s])
    parts.extend(work[:, c] for c in range(C))
    sig = jnp.concatenate(parts, axis=0)
    with dd.pinned(lshift):
        out = _analyze_core_exact(sig, n=n, bps=bps, max_params=max_params,
                                  max_fixed=max_fixed, fft_size=fft_size,
                                  max_porder=max_porder)
    u = _zigzag(out["residual"])
    small = {k: out[k] for k in ("pre_prev", "pre_coef", "orders", "rshifts",
                                 "coefs", "code_type", "porder",
                                 "ltp_period", "ltp_coefs", "risky")}
    small["section_bits"] = out["rice_bits"]
    big = dict(u=u, code_type=out["code_type"], porder=out["porder"],
               ks=out["ks"])
    return small, big
