"""TPU batched decode synthesis: the order-p int32 recurrence as a scan.

Entropy decode is inherently serial per block (self-delimiting codewords) and
lives in the native decoder; blocks are independent, so the *synthesis* chain
(LPC recurrence, LTP, de-emphasis, stereo inverse, offset shift) batches over
the block axis here. One lax.scan step produces one sample for every block at
once — the within-block dependence is sequential, the across-block axis is the
vector axis (SURVEY §5 'long-context' mapping).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n", "max_order"))
def lpc_synthesize_batch(residual: jnp.ndarray, coefs: jnp.ndarray,
                         orders: jnp.ndarray, rshifts: jnp.ndarray,
                         *, n: int, max_order: int):
    """residual: (V, n) int32; coefs: (V, max_order) int32 reversed
    left-aligned; per-block orders/rshifts. Returns reconstructed (V, n).
    """
    V = residual.shape[0]
    M = max_order
    j = jnp.arange(M)[None, :]
    cols = j - (M - orders)[:, None]
    aligned = jnp.where(cols >= 0,
                        jnp.take_along_axis(coefs, jnp.clip(cols, 0, M - 1),
                                            axis=1), 0)
    half = jnp.where(rshifts > 0, jnp.int32(1) << jnp.maximum(rshifts - 1, 0),
                     jnp.int32(-2147483648))
    active = orders > 0

    def step(carry, x):
        window, s = carry            # window: (V, M) last M outputs
        acc = jnp.sum(window * aligned, axis=1) + half
        pred = acc >> rshifts
        prologue = x + window[:, -1]
        main = x - pred
        newval = jnp.where(s == 0, x,
                           jnp.where(s < orders, prologue, main))
        newval = jnp.where(active, newval, x)
        window = jnp.concatenate([window[:, 1:], newval[:, None]], axis=1)
        return (window, s + 1), newval

    init = (jnp.zeros((V, M), jnp.int32), jnp.int32(0))
    _, out = jax.lax.scan(step, init, residual.T)
    return out.T


@partial(jax.jit, static_argnames=("n",))
def deemphasis_batch(data: jnp.ndarray, coef: jnp.ndarray, prev: jnp.ndarray,
                     *, n: int):
    """y[i] = x[i] + ((y[i-1]*coef) >> 4), batched over blocks."""
    def step(y_prev, x):
        y = x + ((y_prev * coef) >> 4)
        return y, y

    _, out = jax.lax.scan(step, prev.astype(jnp.int32), data.T)
    return out.T


def synthesize_blocks(residuals: np.ndarray, coefs: np.ndarray,
                      orders: np.ndarray, rshifts: np.ndarray,
                      pre_coef: np.ndarray, pre_prev: np.ndarray,
                      n: int) -> np.ndarray:
    """Full batched synthesis for LTP-free blocks (JAX device path)."""
    M = max(int(orders.max()), 1) if orders.size else 1
    out = lpc_synthesize_batch(
        jnp.asarray(residuals), jnp.asarray(coefs[:, :M]),
        jnp.asarray(orders), jnp.asarray(rshifts), n=n, max_order=M)
    out = deemphasis_batch(out, jnp.asarray(pre_coef),
                           jnp.asarray(pre_prev), n=n)
    return np.asarray(out)
