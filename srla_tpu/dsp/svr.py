"""SVR-style LPC coefficient refinement (soft-threshold iterations).

Per margin in the preset list: iterate residual -> soft threshold -> solve for
a coefficient delta via a cached Cholesky factorization of the (ridged) signal
covariance; keep the coefficients minimizing the estimated recursive-Rice code
length. (Parity: libs/lpc/src/lpc.c:988-1163.)
"""

from __future__ import annotations

import math

import numpy as np

from .pitch import cholesky_decompose, cholesky_solve

_FLT_MAX = 3.402823466e38
_OBJ_EPSILON = 1e-8
_SVR_BPS = 16  # the reference estimator hardcodes 16-bit (lpc.c:1041)


def _rgr_mean_code_length(mean_abs_error: float, bps: int) -> float:
    intmean = mean_abs_error * (1 << bps)
    rho = 1.0 / (1.0 + intmean)
    lv = math.log(0.5127629514) / math.log(1.0 - rho)
    k2f = (math.log(lv) * 1.4426950408889634) if lv > 0 else -math.inf
    k2 = int(max(0.0, k2f))
    k1 = k2 + 1
    k1f = math.pow(1.0 - rho, float(1 << k1))
    k2f2 = math.pow(1.0 - rho, float(1 << k2))
    return (1.0 + k1) * (1.0 - k1f) + (1.0 + k2 + (1.0 / (1.0 - k2f2))) * k1f


def _soft_threshold(x: np.ndarray, eps: float) -> np.ndarray:
    return np.sign(x) * np.maximum(np.abs(x) - eps, 0.0)


def svr_refine_one(data: np.ndarray, coef: np.ndarray, order: int, n: int,
                   max_iter: int, ridge: float, margins) -> np.ndarray:
    """Refine one block's coefficient vector (f64, order-sensitive sums are
    sequential where the reference is; covariance uses the exact-in-f64 int
    trick only when inputs are integers, which they are not here, so this is a
    scalar-sequential port kept for bit parity)."""
    if max_iter == 0 or order == 0:
        return coef
    cov = np.zeros((order, order))
    # Covariance over windows [smpl .. smpl+order-1], smpl < n - order.
    for i in range(order):
        for j in range(i, order):
            s = 0.0
            for smpl in range(n - order):
                s += data[smpl + i] * data[smpl + j]
            cov[i, j] = s
    for i in range(order):
        for j in range(i + 1, order):
            cov[j, i] = cov[i, j]
    for i in range(order):
        cov[i, i] *= (1.0 + ridge)
    low = cholesky_decompose(cov, order)
    if low is None:
        return np.zeros_like(coef)
    init = coef.copy()
    best = init.copy()
    cur = coef.copy()
    min_obj = _FLT_MAX
    for margin in margins:
        prev_obj = _FLT_MAX
        cur[:] = init
        for _ in range(max_iter):
            resid = data[:n].copy()
            mabse = 0.0
            rvec = np.zeros(order)
            for smpl in range(order, n):
                acc = resid[smpl]
                for i in range(order):
                    acc += cur[i] * data[smpl - i - 1]
                resid[smpl] = acc
                mabse += abs(acc)
                th = acc
                sgn = (th > 0) - (th < 0)
                mag = abs(th) - margin
                th = sgn * (mag if mag > 0.0 else 0.0)
                resid[smpl] = th
                for i in range(order):
                    rvec[i] += th * data[smpl - i - 1]
            obj = _rgr_mean_code_length(mabse / n, _SVR_BPS)
            delta = cholesky_solve(cov, order, rvec, low)
            if obj < min_obj:
                best[:] = cur
                min_obj = obj
            if prev_obj < obj or abs(prev_obj - obj) < _OBJ_EPSILON:
                break
            cur[:order] = cur[:order] + delta
            prev_obj = obj
    return best


def svr_refine_batch(dbl: np.ndarray, coefs_f: np.ndarray, orders: np.ndarray,
                     n: int, max_iter: int, bps: int, ridge: float,
                     margins) -> np.ndarray:
    out = coefs_f.copy()
    for b in range(dbl.shape[0]):
        o = int(orders[b])
        if o > 0:
            out[b, :o] = svr_refine_one(dbl[b], coefs_f[b, :o].copy(), o, n,
                                        max_iter, ridge, margins)
    return out
