"""Double-float (two-float32) arithmetic for near-f64 analysis on TPU.

TPU compute units have no native float64. The bit-exact encode spec, however,
only needs f64 *decisions* (rounding of quantized coefficients, order argmins,
Rice-parameter boundaries...) — not f64 values. This module provides ~2^-48
relative-accuracy arithmetic built from pairs of float32 (hi, lo) with
|lo| <= ulp(hi)/2, so the device analysis can compute every decision quantity
accurately enough to *prove* (per value) that its decision matches the host's
f64 one — values too close to a decision boundary are flagged and re-derived
on the host (see kernels/exact.py).

All error-free transformations here avoid relying on FMA availability or
contraction behavior: two_prod uses a mantissa-masking Veltkamp split (each
factor is reduced to a 12-bit significand, making every partial product exact
in f32), and two_sum is the branch-free Knuth form (adds/subs only, immune to
contraction). This keeps results identical across XLA:CPU and XLA:TPU.

References: Dekker (1971), Knuth TAOCP v2, Hida/Li/Bailey's QD library
algorithms (public domain), adapted to f32 pairs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

_MASK = np.int32(~0xFFF)  # keep 11 explicit mantissa bits (12-bit significand)


def _f32(x):
    return jnp.asarray(x, jnp.float32)


# ---------------------------------------------------------------------------
# Error-free transformations
# ---------------------------------------------------------------------------

def two_sum(a, b):
    """s + err == a + b exactly (branch-free Knuth TwoSum; adds/subs only)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    """Requires |a| >= |b| (or a == 0). s + err == a + b exactly."""
    s = a + b
    err = b - (s - a)
    return s, err


def _split(a):
    """Veltkamp split via mantissa masking: a == hi + lo exactly, with both
    parts having <= 12-bit significands (products of two parts are exact in
    f32). Truncation-based, so no rounding-mode/contraction dependence."""
    bits = jax.lax.bitcast_convert_type(a, jnp.int32)
    hi = jax.lax.bitcast_convert_type(bits & _MASK, jnp.float32)
    return hi, a - hi


def two_prod(a, b):
    """p + err == a * b exactly (barring overflow/underflow-to-denormal)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


# ---------------------------------------------------------------------------
# Double-float ops. A df value is a tuple (hi, lo) of equal-shape f32 arrays.
# ---------------------------------------------------------------------------

def df(hi, lo=None):
    hi = _f32(hi)
    return (hi, jnp.zeros_like(hi) if lo is None else _f32(lo))


def add(x, y):
    """Accurate dd addition (Knuth): relative error <= 3 * 2^-48."""
    s1, s2 = two_sum(x[0], y[0])
    t1, t2 = two_sum(x[1], y[1])
    s2 = s2 + t1
    s1, s2 = quick_two_sum(s1, s2)
    s2 = s2 + t2
    return quick_two_sum(s1, s2)


def sub(x, y):
    return add(x, (-y[0], -y[1]))


def neg(x):
    return (-x[0], -x[1])


def mul(x, y):
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return quick_two_sum(p, e)


def mul_pow2(x, p):
    """Multiply by an exact power of two (scalar float, exact)."""
    c = np.float32(p)
    return (x[0] * c, x[1] * c)


def div(x, y):
    q1 = x[0] / y[0]
    r = sub(x, mul(df(q1), y))
    q2 = r[0] / y[0]
    r = sub(r, mul(df(q2), y))
    q3 = r[0] / y[0]
    s, e = quick_two_sum(q1, q2)
    return add((s, e), df(q3))


def sqrt(x):
    """dd sqrt (one dd Newton step on the f32 estimate). x must be >= 0;
    returns 0 for x == 0."""
    s = jnp.sqrt(x[0])
    safe = jnp.where(s > 0, s, 1.0)
    # r = (x - s^2) / (2 s);  sqrt(x) ~= s + r
    s2 = two_prod(safe, safe)
    diff = sub(x, s2)
    r = diff[0] / (2.0 * safe)
    hi, lo = quick_two_sum(safe, r)
    zero = x[0] <= 0
    return (jnp.where(zero, 0.0, hi), jnp.where(zero, 0.0, lo))


def from_int32(x):
    """Exact df representation of int32 values (any magnitude)."""
    x = jnp.asarray(x, jnp.int32)
    hi_i = x & jnp.int32(~0xFF)
    lo_i = x & jnp.int32(0xFF)
    # |hi_i| <= 2^31 with 8 trailing zero bits -> <= 24-bit significand: exact.
    return quick_two_sum(hi_i.astype(jnp.float32), lo_i.astype(jnp.float32))


def to_f32(x):
    return x[0] + x[1]


# -- comparisons (lexicographic on the normalized pair) --------------------

def lt(x, y):
    return (x[0] < y[0]) | ((x[0] == y[0]) & (x[1] < y[1]))


def le(x, y):
    return (x[0] < y[0]) | ((x[0] == y[0]) & (x[1] <= y[1]))


def gt(x, y):
    return lt(y, x)


def ge(x, y):
    return le(y, x)


def abs_(x):
    flip = x[0] < 0
    return (jnp.where(flip, -x[0], x[0]), jnp.where(flip, -x[1], x[1]))


def floor(x):
    """dd floor. Exact when |x| < 2^31 (our use sites)."""
    fh = jnp.floor(x[0])
    hi_is_int = fh == x[0]
    fl = jnp.where(hi_is_int, jnp.floor(x[1]), 0.0)
    return quick_two_sum(fh, fl)


def round_half_away(x):
    """C round() semantics: round half away from zero, as a df value."""
    ax = abs_(x)
    r = floor(add(ax, df(np.float32(0.5))))
    s = jnp.where(x[0] < 0, -1.0, 1.0).astype(jnp.float32)
    return (r[0] * s, r[1] * s)


# ---------------------------------------------------------------------------
# Host-side helpers (numpy, f64)
# ---------------------------------------------------------------------------

def split_f64(x):
    """Split f64 numpy values into a (hi, lo) f32 pair (error < 2^-49 rel)."""
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def to_f64(x):
    """Recombine a fetched (hi, lo) pair into numpy f64."""
    return np.asarray(x[0], np.float64) + np.asarray(x[1], np.float64)


def const(v):
    """df constant from a Python float (host-side split, device constant)."""
    hi, lo = split_f64(np.float64(v))
    return (jnp.float32(hi), jnp.float32(lo))


# ---------------------------------------------------------------------------
# Natural log: table-based argument reduction + series.
#   x = m * 2^e, m in [0.5, 1);  j = top-7 mantissa bits of m;
#   m_j = (128 + j) / 256;  r = m/m_j - 1 in [0, 2^-7);
#   ln x = e*ln2 + ln(m_j) + ln(1+r),  ln(1+r) by 6-term alternating series.
# Accuracy ~2^-45 relative (validated in tests/test_df64.py).
# ---------------------------------------------------------------------------

_LN_TABLE_N = 128
_mj = (np.arange(_LN_TABLE_N, dtype=np.float64) + _LN_TABLE_N) / (2 * _LN_TABLE_N)
_LN_MJ_HI, _LN_MJ_LO = split_f64(np.log(_mj))
_RECIP_MJ_HI, _RECIP_MJ_LO = split_f64(1.0 / _mj)
_LN2 = split_f64(np.float64(math.log(2.0)))


def log(x):
    """dd natural log. Domain: x > 0 (finite); returns garbage outside —
    callers gate/flag non-positive inputs themselves."""
    m_hi, e = jnp.frexp(jnp.maximum(x[0], np.float32(1e-38)))
    scale = jnp.exp2(-e.astype(jnp.float32))
    m = (m_hi, x[1] * scale)  # exact scaling by 2^-e
    # Table index from the mantissa: m in [0.5, 1) -> j in [0, 128).
    j = jnp.clip(((m_hi * (2 * _LN_TABLE_N)).astype(jnp.int32) - _LN_TABLE_N),
                 0, _LN_TABLE_N - 1)
    recip = (jnp.asarray(_RECIP_MJ_HI)[j], jnp.asarray(_RECIP_MJ_LO)[j])
    ln_mj = (jnp.asarray(_LN_MJ_HI)[j], jnp.asarray(_LN_MJ_LO)[j])
    r = sub(mul(m, recip), df(np.float32(1.0)))
    # ln(1+r) = r - r^2/2 + r^3/3 - r^4/4 + r^5/5 - r^6/6  (|r| < 2^-7).
    acc = const(-1.0 / 6.0)
    for c in (1.0 / 5.0, -1.0 / 4.0, 1.0 / 3.0, -1.0 / 2.0, 1.0):
        acc = add(mul(acc, r), const(c))
    ln1pr = mul(acc, r)
    e_dd = (e.astype(jnp.float32), jnp.zeros_like(m_hi))
    return add(add(mul(e_dd, (jnp.full_like(m_hi, _LN2[0]),
                              jnp.full_like(m_hi, _LN2[1]))), ln_mj), ln1pr)


# ---------------------------------------------------------------------------
# Reductions
# ---------------------------------------------------------------------------

def sum_pairwise(x, axis=-1):
    """dd sum along `axis` by pairwise (tree) folding. Length is padded to a
    power of two with zeros; error grows as log2(n) * 2^-48 relative."""
    hi = jnp.moveaxis(x[0], axis, -1)
    lo = jnp.moveaxis(x[1], axis, -1)
    n = hi.shape[-1]
    p = 1
    while p < n:
        p *= 2
    if p != n:
        pad = [(0, 0)] * (hi.ndim - 1) + [(0, p - n)]
        hi = jnp.pad(hi, pad)
        lo = jnp.pad(lo, pad)
    while p > 1:
        p //= 2
        a = (hi[..., :p], lo[..., :p])
        b = (hi[..., p:], lo[..., p:])
        hi, lo = add(a, b)
    return (hi[..., 0], lo[..., 0])
