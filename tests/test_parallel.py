"""Multi-chip sharding path on the virtual 8-device CPU mesh."""

import numpy as np
import pytest


def _devices():
    import jax
    return len(jax.devices())


@pytest.mark.skipif("_devices() < 8", reason="needs 8 (virtual) devices")
def test_full_step_sharded_matches_single():
    import jax

    from srla_tpu.kernels.encode import analyze_variants
    from srla_tpu.parallel import full_step_sharded, make_mesh

    rng = np.random.RandomState(0)
    V, n = 32, 256
    sig = (rng.randn(V, n) * 2000).astype(np.int32)
    mesh = make_mesh(8)
    out, total = full_step_sharded(mesh, sig, n=n, bps=16, max_params=8,
                                   max_fixed=False, fft_size=256,
                                   max_porder=6)
    single = analyze_variants(sig, n=n, bps=16, max_params=8, max_fixed=False,
                              fft_size=256, max_porder=6)
    # Residuals are exact int paths: sharded == single-device.
    np.testing.assert_array_equal(np.asarray(out["residual"]),
                                  np.asarray(single["residual"]))
    assert np.isfinite(total)


@pytest.mark.skipif("_devices() < 8", reason="needs 8 (virtual) devices")
def test_block_sharded_analysis():
    from srla_tpu.parallel import analyze_variants_sharded, make_mesh
    rng = np.random.RandomState(1)
    sig = (rng.randn(16, 512) * 1000).astype(np.int32)
    mesh = make_mesh(8)
    out = analyze_variants_sharded(mesh, sig, n=512, bps=16, max_params=8,
                                   max_fixed=False, fft_size=512,
                                   max_porder=6)
    assert np.asarray(out["rice_bits"]).shape == (16,)


@pytest.mark.skipif("_devices() < 8", reason="needs 8 (virtual) devices")
def test_encode_corpus_sharded_lossless():
    import os

    from srla_tpu import decode
    from srla_tpu.parallel import encode_corpus_sharded, make_mesh

    rng = np.random.RandomState(3)
    files = [(rng.randn(2, 4096 * 5) * (800 + 4000 * f)).astype(np.int32)
             for f in range(2)]
    mesh = make_mesh(8)
    os.environ["SRLA_TPU_HOST_SHARE"] = "0"   # exercise the device path
    try:
        streams = encode_corpus_sharded(mesh, files, 16, 44100, preset=2)
    finally:
        del os.environ["SRLA_TPU_HOST_SHARE"]
    for pcm, stream in zip(files, streams):
        _, out = decode(stream)
        assert np.array_equal(out, pcm)


@pytest.mark.skipif("_devices() < 8", reason="needs 8 (virtual) devices")
def test_fused_dispatch_actually_sharded():
    """The fused exact device program must run SPMD over the mesh: the
    dispatch input carries the block-axis NamedSharding, and its streams are
    byte-identical to the single-device exact path."""
    import os

    from srla_tpu import encode
    from srla_tpu.encoder import EncodeParameter, SRLAEncoder
    from srla_tpu.parallel import make_mesh

    rng = np.random.RandomState(7)
    pcm = (rng.randn(2, 512 * 24) * 2500).astype(np.int32)
    mesh = make_mesh(8)
    param = EncodeParameter(num_channels=2, bits_per_sample=16,
                            sampling_rate=44100, preset=2,
                            max_num_samples_per_block=512,
                            min_num_samples_per_block=512,
                            num_lookahead_samples=4 * 512)
    enc = SRLAEncoder(param, backend="tpu", mesh=mesh)

    seen = {}
    orig = enc._device_dispatch

    def spy(pcm_, spans, idxs, size, lsh):
        st = orig(pcm_, spans, idxs, size, lsh)
        seen["sharding"] = st["small"]["orders"].sharding
        return st

    enc._device_dispatch = spy
    os.environ["SRLA_TPU_HOST_SHARE"] = "0"
    try:
        stream = enc.encode_whole(pcm)
    finally:
        del os.environ["SRLA_TPU_HOST_SHARE"]
    assert "sharding" in seen, "device dispatch never ran"
    # The per-variant outputs must span the whole mesh, not one device.
    assert len(seen["sharding"].device_set) == 8
    ref = encode(pcm, 16, 44100, preset=2, max_block=512, backend="exact")
    assert stream == ref
