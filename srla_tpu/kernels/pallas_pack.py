"""Pallas TPU kernel: codeword-stream bit packing (one-hot masked reduction).

Each grid step packs ROWS variant rows. Codewords are processed in vector
chunks; every codeword contributes its tail to (at most) two 32-bit words,
combined against the FULL output row with a masked sum over the chunk axis —
bit ranges of distinct codewords are disjoint, so integer sums equal ORs
carry-free, and chunk/codeword order is irrelevant (streams need not be
merged or sorted).

Implementation notes for this Mosaic stack: dot_general with M=1 miscompiles
(verified by probe kernels), so the combine is a (Wp, 2*CHUNK) masked select +
lane reduction + a (Wp, 1) -> (1, Wp) reshape. No dynamic slices on the
output, no scatters, no RMW.

STATUS: bit-exact on hardware AND under the interpreter, but the full-width
masked reduction runs ~10x slower than the XLA scatter packer on v5e, so
kernels/bitpack.py remains the production path. Kept as the working Pallas
formulation to iterate on (windowed variant + relayout cost are the levers).
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

    def row_body(r, _):
        def chunk_body(c, acc):
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
            contrib = jnp.sum(jnp.where(lanes == lid2, val2, 0),
                              axis=1, keepdims=True)           # (Wp, 1)
            return acc + contrib.reshape(1, Wp)

        acc = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                jnp.zeros((1, Wp), jnp.int32))
        out_ref[pl.ds(r, 1), :] = acc
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
