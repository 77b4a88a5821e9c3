"""Pallas TPU kernel: codeword-stream bit packing via one-hot MXU matmuls.

Each grid step packs ROWS variant rows. Codewords are processed in vector
chunks; every chunk contributes to two 32-bit words (split as two 16-bit f32
halves so the MXU accumulates exactly), combined against the FULL output row
with a one-hot matmul — the contraction over the chunk axis is simultaneously
the reduction and the lane<->sublane transpose. Bit ranges of distinct
codewords are disjoint, so sums equal ORs carry-free and chunk order is
irrelevant (streams need not be merged or sorted).

No dynamic slices, no scatters, no read-modify-write: per row the two f32
accumulators are loop carries and a single static-width store writes the row.

STATUS: correct under the Pallas interpreter (covered by tests/test_bitpack);
on this machine's Mosaic/axon stack the lowered kernel produces wrong words
(two independent formulations reproduced the discrepancy), so the production
device path uses the XLA scatter packer in kernels/bitpack.py instead.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 256
ROWS = 8


def _lsr(x: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Logical right shift on int32 bit patterns (s in [0, 31])."""
    mask = jnp.where(s == 0, jnp.int32(-1),
                     (jnp.int32(1) << (32 - s)) - 1)  # wraps to 0x7fffffff
    return jnp.where(s == 0, x, (x >> s) & mask)


def _pack_rows_kernel(offs_ref, tails_ref, tbits_ref, out_ref):
    Wp = out_ref.shape[1]
    T = offs_ref.shape[1]
    n_chunks = T // CHUNK
    lanes = jax.lax.broadcasted_iota(jnp.int32, (Wp, 2 * CHUNK), 0)
    dims = (((1,), (1,)), ((), ()))

    def row_body(r, _):
        def chunk_body(c, carry):
            acc_lo, acc_hi = carry
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
            lidA = jnp.where(valid, w0, -1)
            lidB = jnp.where(valid & (vB != 0), w0 + 1, -1)
            lid2 = jnp.concatenate([lidA, lidB], axis=1)       # (1, 2C)
            val2 = jnp.concatenate([vA, vB], axis=1)
            onehot = (lanes == lid2).astype(jnp.float32)       # (Wp, 2C)
            lo = (val2 & 0xFFFF).astype(jnp.float32)
            hi = _lsr(val2, jnp.int32(16)).astype(jnp.float32)
            acc_lo = acc_lo + jax.lax.dot_general(
                lo, onehot, dims, preferred_element_type=jnp.float32)
            acc_hi = acc_hi + jax.lax.dot_general(
                hi, onehot, dims, preferred_element_type=jnp.float32)
            return (acc_lo, acc_hi)

        acc0 = jnp.zeros((1, Wp), jnp.float32)
        acc_lo, acc_hi = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                           (acc0, acc0))
        out_ref[pl.ds(r, 1), :] = (acc_lo.astype(jnp.int32)
                                   | (acc_hi.astype(jnp.int32) << 16))
        return 0

    jax.lax.fori_loop(0, ROWS, row_body, 0)


@partial(jax.jit, static_argnames=("W",))
def pallas_pack_rows(offsets: jnp.ndarray, tails: jnp.ndarray,
                     tbits: jnp.ndarray, W: int):
    """offsets/tails/tbits: (V, T), V % 8 == 0, T % 256 == 0. Codewords may
    appear in any order (masked slots: tbits 0; offsets beyond W*32 dropped).
    Returns (V, W) uint32 big-endian-bit words."""
    V, T = offsets.shape
    assert V % ROWS == 0 and T % CHUNK == 0, (V, T)
    Wp = ((W + 127) // 128) * 128
    interpret = jax.default_backend() != "tpu"
    offsets = jnp.where(tbits > 0, jnp.minimum(offsets, Wp * 32), Wp * 32)
    tails_i = jax.lax.bitcast_convert_type(tails.astype(jnp.uint32), jnp.int32)
    out = pl.pallas_call(
        _pack_rows_kernel,
        grid=(V // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, T), lambda v: (v, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, T), lambda v: (v, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, T), lambda v: (v, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, Wp), lambda v: (v, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, Wp), jnp.int32),
        interpret=interpret,
    )(offsets.astype(jnp.int32), tails_i, tbits.astype(jnp.int32))
    return jax.lax.bitcast_convert_type(out[:, :W], jnp.uint32)
