"""On-device bitstream packing (JAX): prefix-sum pack without scatters.

Every residual section is a sequence of codewords, each of which is a run of
leading zeros followed by a short (<= 32-bit) tail. Packing therefore reduces
to: compute each tail's absolute bit offset (cumulative sums), split each tail
into contributions to (at most) two consecutive 32-bit output words, and then
materialize each output word as a *difference of prefix sums* — codeword
offsets are monotone, so all contributions to a word form a contiguous range:

    word[w] = CUM[hi(w)] - CUM[lo(w)]      (wrapping int32 arithmetic; bit
                                            ranges are disjoint, so sum == or)

with hi/lo found by a vectorized binary search. This replaces the byte-serial
bit_stream engine of classic codecs with cumsum + searchsorted + gather — all
TPU-native primitives (BASELINE.json: "vectorized codeword-length computation
plus prefix-sum bitstream pack").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import CODER_LOG2_MAX_NUM_PARTITIONS


def _plane_sum(word_ids: jnp.ndarray, values: jnp.ndarray, W: int):
    """Per-row: sum `values` into W bins (bit-disjoint, so sum == or).

    Entries with id >= W are dropped. Batched scatter-add with the
    sorted-indices hint (ids are monotone per row).
    """
    V = word_ids.shape[0]
    buf = jnp.zeros((V, W + 1), jnp.uint32)
    ids = jnp.minimum(word_ids, W)
    # NOTE: do NOT pass indices_are_sorted=True — the XLA:TPU sorted-scatter
    # path produces wrong results for batch sizes above ~3k rows (observed on
    # v5e); the plain scatter is correct at all sizes.
    buf = buf.at[jnp.arange(V)[:, None], ids].add(values)
    return buf[:, :W]


def _word_splits(offsets, tails, tbits, W: int):
    """Per-entry word index and the two word-aligned contributions."""
    offsets = offsets.astype(jnp.int32)
    tails = tails.astype(jnp.uint32)
    tbits = tbits.astype(jnp.int32)
    valid = tbits > 0
    limit = W * 32
    offsets = jnp.where(valid, jnp.minimum(offsets, limit), limit)
    w0 = offsets >> 5
    sh = offsets & 31
    # First word holds the tail's high (tbits - over) bits; `over` spill bits
    # go to the top of the next word.
    over = jnp.maximum(tbits - (32 - sh), 0)
    keep = tbits - over
    vA = (tails >> over.astype(jnp.uint32)) << (32 - sh - keep).astype(jnp.uint32)
    vA = jnp.where(valid & (keep > 0), vA, 0)
    ov_nz = over > 0
    vB = jnp.where(ov_nz,
                   (tails << (32 - jnp.maximum(over, 1)).astype(jnp.uint32)),
                   0)
    vB = jnp.where(valid, vB, 0)
    return w0.astype(jnp.int32), vA, vB


def _boundary_search(w0: jnp.ndarray, W: int) -> jnp.ndarray:
    """F[:, j] = #entries with w0 < j, for j = 0..W+1 (w0 monotone per row).

    Vectorized binary search: ~log2(T) rounds of take_along_axis gathers —
    no scatters (XLA:TPU scatters serialize; gathers are fast)."""
    V, T = w0.shape
    j = jnp.arange(W + 2, dtype=jnp.int32)[None, :]
    lo = jnp.zeros((V, W + 2), jnp.int32)
    hi = jnp.full((V, W + 2), T, jnp.int32)
    for _ in range(max(1, int(np.ceil(np.log2(max(T, 2)))) + 1)):
        mid = (lo + hi) >> 1
        vals = jnp.take_along_axis(w0, jnp.minimum(mid, T - 1), axis=1)
        less = vals < j
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    return hi


def pack_monotone_stream(offsets: jnp.ndarray, tails: jnp.ndarray,
                         tbits: jnp.ndarray, W: int,
                         impl: str = "scatter") -> jnp.ndarray:
    """Pack one stream of codeword tails into (B, W) uint32 words (MSB-first).

    offsets: (B, T) absolute bit positions of each tail, non-decreasing along
    T. tails: (B, T) uint32 (low `tbits` bits significant). tbits: (B, T),
    0 = masked slot. Entries with offset >= W*32 are dropped.

    word[w] is materialized as a difference of (wrapping int32) prefix sums:
    contributions to one word are bit-disjoint, so their true sum fits 32
    bits and sum == or; entries for word w form the contiguous index range
    [F[w], F[w+1]) because offsets are monotone.
    """
    w0, vA, vB = _word_splits(offsets, tails, tbits, W)
    if impl == "scatter":
        planeA = _plane_sum(w0, vA, W)
        planeB = _plane_sum(jnp.minimum(w0 + 1, W), vB, W)
        return planeA + planeB
    EA = jnp.cumsum(vA.astype(jnp.int32), axis=1)
    EB = jnp.cumsum(vB.astype(jnp.int32), axis=1)
    zero = jnp.zeros((w0.shape[0], 1), jnp.int32)
    EA = jnp.concatenate([zero, EA], axis=1)   # EA[t] = sum vA[:t]
    EB = jnp.concatenate([zero, EB], axis=1)
    F = _boundary_search(w0, W)                # (V, W+2)
    wordA = (jnp.take_along_axis(EA, F[:, 1:W + 1], axis=1)
             - jnp.take_along_axis(EA, F[:, :W], axis=1))
    # Spill plane: ids are w0 + 1, so word w collects [F[w-1], F[w]).
    Fm1 = jnp.concatenate([F[:, :1], F[:, :W - 1]], axis=1)
    wordB = (jnp.take_along_axis(EB, F[:, :W], axis=1)
             - jnp.take_along_axis(EB, Fm1, axis=1))
    return (wordA + wordB).astype(jnp.uint32)


def residual_codewords(u: jnp.ndarray, code_type: jnp.ndarray,
                       porder: jnp.ndarray, ks: jnp.ndarray, n: int):
    """Per-variant codeword decomposition of the residual section.

    u: (V, n) uint32 zigzag residuals; code_type (V,); porder (V,);
    ks (V, 1024). Returns the three monotone streams (header, params,
    samples) as (offsets, tails, tbits) plus total section bits (V,).

    Section layout: [type 2b][porder 10b][per partition: param, samples...].
    """
    V = u.shape[0]
    allzero = code_type == 2
    recursive = code_type == 1

    s_idx = jnp.arange(n, dtype=jnp.int32)[None, :]
    nsmpl = (n >> porder)[:, None]                   # (V, 1)
    part = s_idx // nsmpl                            # (V, n)
    k = jnp.take_along_axis(ks, part, axis=1).astype(jnp.int32)
    ku = k.astype(jnp.uint32)

    ui = u.astype(jnp.uint32)
    mask = (jnp.uint32(1) << ku) - jnp.uint32(1)
    # Plain Rice: q zeros, 1, k low bits.
    q_r = (ui >> ku).astype(jnp.int32)
    tail_r = (jnp.uint32(1) << ku) | (ui & mask)
    tb_r = k + 1
    # Recursive Rice: small -> 1 + k1 bits; big -> q' zeros, 1, k2 bits.
    k1pow = jnp.uint32(1) << (ku + 1)
    small = ui < k1pow
    tmp = jnp.where(small, 0, ui - k1pow)
    q_rr = jnp.where(small, 0, 1 + (tmp >> ku).astype(jnp.int32))
    tail_rr = jnp.where(small, k1pow | ui, (jnp.uint32(1) << ku) | (tmp & mask))
    tb_rr = jnp.where(small, k + 2, k + 1)

    lead = jnp.where(recursive[:, None], q_rr, q_r)
    tails = jnp.where(recursive[:, None], tail_rr, tail_r)
    tbits = jnp.where(recursive[:, None], tb_rr, tb_r)
    sample_bits = lead + tbits                       # (V, n)

    # Partition parameter codewords: 5-bit k, then unary zigzag deltas.
    MAXP = ks.shape[1]
    nparts = (jnp.int32(1) << porder)
    pidx = jnp.arange(MAXP, dtype=jnp.int32)[None, :]
    pactive = pidx < nparts[:, None]
    ks32 = ks.astype(jnp.int32)
    prev = jnp.concatenate([ks32[:, :1], ks32[:, :-1]], axis=1)
    diff = ks32 - prev
    udiff = (((-(diff < 0).astype(jnp.int32)) ^ (diff << 1))
             .astype(jnp.int32))
    p_lead = jnp.where(pidx == 0, 0, udiff)
    p_tails = jnp.where(pidx == 0, ks32, 1).astype(jnp.uint32)
    p_tbits = jnp.where(pidx == 0, 5, 1)
    p_lead = jnp.where(pactive, p_lead, 0)
    p_tbits = jnp.where(pactive, p_tbits, 0)
    param_bits = jnp.where(pactive, p_lead + p_tbits, 0)   # (V, MAXP)

    # Absolute offsets. Emission order interleaves params and samples:
    # offset(sample s) = 12 + sum(param_bits[<= part(s)]) + sum(sample_bits[<s])
    # offset(param  i) = 12 + sum(param_bits[< i]) + sum(sample_bits[< i*nsmpl])
    csum_params_inc = jnp.cumsum(param_bits, axis=1)          # inclusive
    csum_params_exc = csum_params_inc - param_bits
    csum_samples_exc = jnp.cumsum(sample_bits, axis=1) - sample_bits
    samp_off = 12 + jnp.take_along_axis(csum_params_inc, part, axis=1) \
        + csum_samples_exc + lead
    first_sample = jnp.minimum(pidx * nsmpl, n - 1)           # (V, MAXP)
    samples_before = jnp.take_along_axis(csum_samples_exc, first_sample,
                                         axis=1)
    samples_before = jnp.where(pactive, samples_before, 0)
    param_off = 12 + csum_params_exc + samples_before + p_lead

    total_bits = jnp.where(
        allzero, 2,
        12 + csum_params_inc[:, -1]
        + jnp.cumsum(sample_bits, axis=1)[:, -1])

    # Header stream: type (2b) + porder (10b); ALLZERO emits only the type.
    h_off = jnp.stack([jnp.zeros(V, jnp.int32),
                       jnp.full((V,), 2, jnp.int32)], axis=1)
    h_tails = jnp.stack([code_type.astype(jnp.uint32),
                         porder.astype(jnp.uint32)], axis=1)
    h_tbits = jnp.stack([jnp.full((V,), 2, jnp.int32),
                         jnp.where(allzero, 0,
                                   CODER_LOG2_MAX_NUM_PARTITIONS)], axis=1)

    dead = allzero[:, None]
    p_tbits = jnp.where(dead, 0, p_tbits)
    tbits = jnp.where(dead, 0, tbits)
    return ((h_off, h_tails, h_tbits),
            (param_off, p_tails, p_tbits),
            (samp_off, tails, tbits),
            total_bits)


def pack_residual_sections(u, code_type, porder, ks, n: int, W: int,
                           impl: str = "scatter"):
    """Pack every variant's residual section into (V, W) uint32 + bit counts."""
    h, p, s, total = residual_codewords(u, code_type, porder, ks, n)
    words = (pack_monotone_stream(*h, W, impl)
             + pack_monotone_stream(*p, W, impl)
             + pack_monotone_stream(*s, W, impl))
    return words, total
