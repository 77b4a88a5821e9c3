"""Multi-chip scaling: shard the block axis over a device mesh.

The codec's natural parallel dimension is blocks (they are fully independent
in the stream format — SURVEY §5), so data parallelism over ICI is a 1-D mesh
with the variant/block axis sharded. Collectives only appear for corpus-level
reductions (total bits), which XLA lowers to an all-reduce over the mesh.
"""

from __future__ import annotations

from functools import partial

from . import kernels as _kernels  # noqa: F401  (configures the XLA cache)

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("blocks",))


def analyze_variants_sharded(mesh: Mesh, sig: np.ndarray, *, n: int, bps: int,
                             max_params: int, max_fixed: bool, fft_size: int,
                             max_porder: int):
    """Block-sharded version of kernels.encode.analyze_variants.

    sig: (V, n) with V divisible by the mesh size. Every stage is elementwise
    over the block axis, so the only communication is the final corpus-bits
    all-reduce; outputs stay sharded until fetched.
    """
    from .kernels.encode import analyze_variants
    spec = NamedSharding(mesh, P("blocks", None))
    sig = jax.device_put(sig, spec)
    out = analyze_variants(sig, n=n, bps=bps, max_params=max_params,
                           max_fixed=max_fixed, fft_size=fft_size,
                           max_porder=max_porder)
    return out


@partial(jax.jit, static_argnames=("n", "bps", "max_params", "max_fixed",
                                   "fft_size", "max_porder"))
def _train_style_step(sig, *, n, bps, max_params, max_fixed, fft_size,
                      max_porder):
    """One 'step': full analysis + corpus-level reduction (collective)."""
    from .kernels.encode import analyze_variants
    out = analyze_variants(sig, n=n, bps=bps, max_params=max_params,
                           max_fixed=max_fixed, fft_size=fft_size,
                           max_porder=max_porder)
    total_bits = jnp.sum(out["rice_bits"].astype(jnp.float32))
    return out, total_bits


def full_step_sharded(mesh: Mesh, sig: np.ndarray, *, n: int, bps: int = 16,
                      max_params: int = 32, max_fixed: bool = False,
                      fft_size: int | None = None, max_porder: int = 6):
    """Jit the full analysis step over the mesh and run it once."""
    if fft_size is None:
        fft_size = 1 << (n - 1).bit_length()
    spec = NamedSharding(mesh, P("blocks", None))
    sig = jax.device_put(np.asarray(sig, np.int32), spec)
    out, total = _train_style_step(sig, n=n, bps=bps, max_params=max_params,
                                   max_fixed=max_fixed, fft_size=fft_size,
                                   max_porder=max_porder)
    jax.block_until_ready(total)
    return out, float(total)


def encode_corpus_sharded(mesh: Mesh, pcm_list, bits_per_sample: int,
                          sampling_rate: int, preset: int = 4,
                          max_block: int = 4096):
    """Encode a corpus of files with the block axis sharded over the mesh.

    Every file's block batch is uploaded with NamedSharding(P("blocks", ...)),
    so device analysis runs block-parallel across all chips; assembly stays
    on host. This is the corpus-throughput deployment shape (SURVEY §7 step
    7): blocks are independent, so the only cross-chip traffic is the
    gather/compaction of chosen packed sections.

    Returns a list of .srl byte streams (valid + lossless; the device path
    picks parameters in f32 — see SRLAEncoder backend notes).
    """
    from .encoder import EncodeParameter, SRLAEncoder

    out = []
    for pcm in pcm_list:
        pcm = np.asarray(pcm, dtype=np.int32)
        param = EncodeParameter(
            num_channels=pcm.shape[0], bits_per_sample=bits_per_sample,
            sampling_rate=sampling_rate, preset=preset,
            max_num_samples_per_block=max_block,
            min_num_samples_per_block=max_block,
            num_lookahead_samples=4 * max_block)
        enc = SRLAEncoder(param, backend="tpu", mesh=mesh)
        out.append(enc.encode_whole(pcm))
    return out


def decode_corpus_sharded(mesh: Mesh, streams, check_checksum: bool = True):
    """Decode a corpus of .srl streams with the block axis sharded over the
    mesh: the word-machine entropy scan, compaction, and synthesis scans all
    run SPMD over blocks (kernels/decode2.py is elementwise/scan over the
    block axis, so GSPMD inserts no collectives until the host fetch).

    Returns a list of (C, N) int32 PCM arrays, bit-exact with the
    single-device / host decode.
    """
    from .decoder import SRLADecoder

    out = []
    for stream in streams:
        dec = SRLADecoder(check_checksum=check_checksum, backend="tpu",
                          mesh=mesh)
        _, pcm = dec.decode_whole(stream)
        out.append(pcm)
    return out
