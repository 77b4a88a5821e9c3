"""Pallas TPU kernel: monotone codeword-stream bit packing.

Each grid step packs ROWS variant rows. Within a row, codewords are processed
in vector chunks of CHUNK lanes. Offsets are monotone, so a chunk's
contributions land in a contiguous word window; the chunk is combined into
that dense window by a one-hot **matmul** on the MXU (contract over the chunk
axis — this is simultaneously the reduction and the lane<->sublane transpose,
which Mosaic has no cheap primitive for), then OR-merged into the output row
at a 128-aligned dynamic offset. No scatters anywhere.

Exactness: bit ranges of distinct codewords are disjoint, so sums equal ORs
carry-free; the 32-bit contributions are split into two 16-bit halves so the
f32 MXU accumulates them exactly (each half sum <= 0xFFFF < 2^24).

A chunk whose codewords span more than the window (possible only with very
long zero runs) sets a per-variant overflow flag; the host repacks those rare
variants with the vectorized numpy emitter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 256
WINDOW = 640   # words; 256 codewords * <=33 bits = 264 words + align slack
ROWS = 8       # variant rows per grid step (sublane tiling requirement)


def _lsr(x: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Logical right shift on int32 bit patterns (s in [0, 31])."""
    mask = jnp.where(s == 0, jnp.int32(-1),
                     (jnp.int32(1) << (32 - s)) - 1)  # wraps to 0x7fffffff
    return jnp.where(s == 0, x, (x >> s) & mask)


def _pack_rows_kernel(offs_ref, tails_ref, tbits_ref, out_ref, ovf_ref):
    Wp = out_ref.shape[1]
    T = offs_ref.shape[1]
    n_chunks = T // CHUNK
    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, 2 * CHUNK), 0)

    def row_body(r, _):
        def chunk_body(c, ovf):
            off = offs_ref[pl.ds(r, 1), pl.ds(c * CHUNK, CHUNK)]  # (1, CHUNK)
            tl = tails_ref[pl.ds(r, 1), pl.ds(c * CHUNK, CHUNK)]
            tb = tbits_ref[pl.ds(r, 1), pl.ds(c * CHUNK, CHUNK)]
            valid = tb > 0
            w0 = off >> 5
            sh = off & 31
            over = jnp.maximum(tb - (32 - sh), 0)
            keep = tb - over
            vA = _lsr(tl, over) << (32 - sh - keep)
            vA = jnp.where(valid & (keep > 0), vA, 0)
            vB = jnp.where(valid & (over > 0),
                           tl << (32 - jnp.maximum(over, 1)), 0)
            base = jnp.minimum(
                jnp.min(jnp.where(valid, w0, jnp.int32(2 ** 30))),
                Wp - WINDOW)
            abase = jnp.maximum((base >> 7) << 7, 0)
            lidA = jnp.where(valid, w0 - abase, -1)
            lidB = jnp.where(valid & (vB != 0), w0 + 1 - abase, -1)
            ovf = ovf | jnp.any((lidA >= WINDOW) | (lidB >= WINDOW))
            # One-hot matmul: contract over the codeword axis; (1, WINDOW).
            lid2 = jnp.concatenate([lidA, lidB], axis=1)     # (1, 2C)
            val2 = jnp.concatenate([vA, vB], axis=1)         # (1, 2C)
            onehot = (lanes == lid2).astype(jnp.float32)     # (WINDOW, 2C)
            lo = (val2 & 0xFFFF).astype(jnp.float32)
            hi = _lsr(val2, jnp.int32(16)).astype(jnp.float32)
            dims = (((1,), (1,)), ((), ()))
            acc_lo = jax.lax.dot_general(lo, onehot, dims,
                                         preferred_element_type=jnp.float32)
            acc_hi = jax.lax.dot_general(hi, onehot, dims,
                                         preferred_element_type=jnp.float32)
            acc = acc_lo.astype(jnp.int32) | (acc_hi.astype(jnp.int32) << 16)
            idx = pl.multiple_of(abase, 128)
            cur = out_ref[pl.ds(r, 1), pl.ds(idx, WINDOW)]
            out_ref[pl.ds(r, 1), pl.ds(idx, WINDOW)] = cur | acc
            return ovf

        ovf = jax.lax.fori_loop(0, n_chunks, chunk_body, False)
        ovf_ref[r, 0] = ovf.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, ROWS, row_body, 0)


@partial(jax.jit, static_argnames=("W",))
def pallas_pack_rows(offsets: jnp.ndarray, tails: jnp.ndarray,
                     tbits: jnp.ndarray, W: int):
    """offsets/tails/tbits: (V, T), V % 8 == 0, T % 256 == 0; offsets monotone
    per row (masked slots: tbits 0). Returns ((V, W) uint32 big-endian-bit
    words and (V,) int32 overflow flags)."""
    V, T = offsets.shape
    assert V % ROWS == 0 and T % CHUNK == 0, (V, T)
    Wp = ((W + WINDOW + 127) // 128) * 128  # slack + lane alignment
    interpret = jax.default_backend() != "tpu"
    tails_i = jax.lax.bitcast_convert_type(tails.astype(jnp.uint32), jnp.int32)
    out, ovf = pl.pallas_call(
        _pack_rows_kernel,
        grid=(V // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, T), lambda v: (v, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, T), lambda v: (v, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, T), lambda v: (v, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, Wp), lambda v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 1), lambda v: (v, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((V, Wp), jnp.int32),
            jax.ShapeDtypeStruct((V, 1), jnp.int32),
        ],
        interpret=interpret,
    )(offsets.astype(jnp.int32), tails_i, tbits.astype(jnp.int32))
    return (jax.lax.bitcast_convert_type(out[:, :W], jnp.uint32), ovf[:, 0])
