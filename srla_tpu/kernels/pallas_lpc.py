"""Pallas TPU kernel: batched LPC synthesis recurrence (+fused de-emphasis).

Device twin of kernels/decode2._lpc_scan — the sequential integer recurrence
at the heart of block decode (reference:
libs/srla_decoder/src/srla_lpc_synthesize.c SRLALPC_Synthesize):

    pred[s] = (sum_j win[s-M+j] * aligned[j] + half) >> rshift
    y[s]    = x[s]              (s == 0, or order 0)
              x[s] + y[s-1]     (0 < s < order: progressive warm-up)
              x[s] - pred[s]    (s >= order)
    fused:  out[s] = y[s] + ((out[s-1] * dcoef) >> 4)   (de-emphasis)

The XLA formulation is a lax.scan with one step per SAMPLE (~4 us/step of
dispatch overhead on v5e — NOTES.md round-3 cost model), so a 4096-sample
group costs ~16 ms regardless of how little work each step does. Here the
whole recurrence runs INSIDE one kernel: rows (block*channel) ride the 128
VPU lanes, the M-tap window lives in the fori_loop carry (a (M, 128) int32
register tile), and each step is a handful of VPU ops — no per-step dispatch.
Measured on v5e (tools/pallas_lpc_ab.py, chunked kernel): 5.6-76x over the
XLA scan at production shapes, bit-exact at all of them.

Layout: the caller transposes residuals to (n, Rp) so the sequential sample
axis is the sublane axis (dynamic per-step slices on the ROW axis are cheap;
per-step lane gathers are not). Row tiles of 128 map one grid cell each.
The sample axis is CHUNKED (grid dim 1, <= _CHUNK samples per step) with the
recurrence state carried across grid steps in VMEM scratch — one huge
fori_loop body at n=8192 crashed the remote Mosaic compiler (HTTP 500,
tools/pallas_lpc_ab.py r5 run) and also pushed the in/out VMEM blocks past
what pipelining wants; the TPU grid executes sequentially (last dim
innermost), so scratch carries exactly like the loop carry did.

All arithmetic is wrapping int32, identical to the XLA path (including the
reference's x86 shift-count quirk: rshift==0 encodes half = INT_MIN,
emulating C's `1 << (rshift-1)` under shift-count masking — see
decoder/NOTES bit-exactness playbook).

Status/selection: decode2._use_pallas_lpc routes decode synthesis here by
default on the TPU backend (SRLA_LPC_IMPL=xla opts out), with a compile-
failure fallback to the XLA scan in decoder._decode_group_dispatch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_CHUNK = 2048        # samples per grid step (validated envelope on v5e)


def _make_kernel(chunk: int, M: int, fuse: bool):
    def kernel(res_ref, al_ref, ord_ref, rsh_ref, half_ref, dcoef_ref,
               dprev_ref, out_ref, win_sc, y_sc):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            win_sc[:] = jnp.zeros((M, LANES), jnp.int32)
            y_sc[:] = dprev_ref[:]

        orders = ord_ref[:]          # (1, LANES) int32
        rsh = rsh_ref[:]
        half = half_ref[:]
        active = orders > 0
        al = al_ref[:]               # (M, LANES) int32
        dcoef = dcoef_ref[:]
        base = j * chunk             # global index of this chunk's sample 0

        def body(s, carry):
            win, yprev = carry       # (M, LANES), (1, LANES)
            x = res_ref[pl.ds(s, 1), :]
            acc = jnp.sum(win * al, axis=0, keepdims=True) + half
            pred = acc >> rsh
            g = base + s
            nv = jnp.where(g == 0, x,
                           jnp.where(g < orders, x + win[M - 1:M],
                                     x - pred))
            nv = jnp.where(active, nv, x)
            win = jnp.concatenate([win[1:], nv], axis=0)
            if fuse:
                y = nv + ((yprev * dcoef) >> 4)
                out_ref[pl.ds(s, 1), :] = y
                return win, y
            out_ref[pl.ds(s, 1), :] = nv
            return win, yprev

        win, y = jax.lax.fori_loop(
            0, chunk, body, (win_sc[:], y_sc[:]), unroll=False)
        win_sc[:] = win
        y_sc[:] = y

    return kernel


@partial(jax.jit,
         static_argnames=("chunk", "M", "fuse", "interpret"))
def _lpc_scan_pallas_T(resT, alT, orders, rshifts, half, dcoef, dprev, *,
                       chunk: int, M: int, fuse: bool, interpret: bool):
    npad, Rp = resT.shape
    grid = (Rp // LANES, npad // chunk)
    col = lambda i, j: (0, i)        # noqa: E731 — per-row-tile params
    seq = lambda i, j: (j, i)        # noqa: E731 — sample-chunked data
    return pl.pallas_call(
        _make_kernel(chunk, M, fuse),
        out_shape=jax.ShapeDtypeStruct((npad, Rp), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, LANES), seq, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, LANES), seq,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((M, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(resT, alT, orders, rshifts, half, dcoef, dprev)


def lpc_scan_pallas(res: jnp.ndarray, aligned: jnp.ndarray,
                    orders: jnp.ndarray, rshifts: jnp.ndarray,
                    n: int, M: int, dcoef=None, dprev=None,
                    interpret: bool = False, chunk: int | None = None
                    ) -> jnp.ndarray:
    """Drop-in twin of decode2._lpc_scan (same args, same semantics).

    res (R, n) int32, aligned (R, M) int32 right-aligned coefficients,
    orders/rshifts (R,) int32; dcoef/dprev fuse the de-emphasis recurrence.
    Rows are padded to a 128-lane multiple (padded rows have order 0 and
    pass residuals through); the sample axis is padded to a chunk multiple
    (padded samples compute garbage past n and are sliced off). `chunk`
    overrides the sample-chunk size for tests.
    """
    R = res.shape[0]
    Rp = -(-R // LANES) * LANES
    fuse = dcoef is not None
    if chunk is None:
        chunk = min(_CHUNK, -(-n // 8) * 8)
    npad = -(-n // chunk) * chunk

    def padR(a, dtype=jnp.int32):
        a = jnp.asarray(a, dtype)
        return jnp.pad(a, [(0, Rp - R)] + [(0, 0)] * (a.ndim - 1))

    half = jnp.where(rshifts > 0,
                     jnp.int32(1) << jnp.maximum(rshifts - 1, 0),
                     jnp.int32(-2147483648))
    resT = jnp.pad(padR(res), ((0, 0), (0, npad - n))).T   # (npad, Rp)
    alT = padR(aligned).T            # (M, Rp)
    row2 = lambda a: padR(a).reshape(1, Rp)      # noqa: E731
    z = jnp.zeros((R,), jnp.int32)
    outT = _lpc_scan_pallas_T(
        resT, alT, row2(orders), row2(rshifts), row2(half),
        row2(dcoef if fuse else z), row2(dprev if fuse else z),
        chunk=chunk, M=M, fuse=fuse, interpret=interpret)
    return outT.T[:R, :n]
