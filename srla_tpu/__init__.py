"""srla_tpu — TPU-native lossless audio codec, bit-compatible with SRLA .srl.

Layers:
  - constants/format/bitio/huffman/rice/fletcher: stream format
  - dsp/: analysis & filter math (host-exact f64 reference + batched int paths)
  - encoder/decoder: block pipelines (batched over blocks)
  - kernels/: JAX/Pallas TPU fast paths
  - cli: `srla`-compatible command line tool
"""

import os as _os


def _enable_xla_cache():
    """Persistent XLA compilation cache (opt out: SRLA_TPU_XLA_CACHE=0).

    First-compile of the device encode programs is minutes through a remote
    TPU link; the cache makes every later process start hot. Failures are
    non-fatal (read-only filesystems, old jax)."""
    if _os.environ.get("SRLA_TPU_XLA_CACHE", "1") == "0":
        return
    try:
        import jax
        if jax.config.jax_compilation_cache_dir:
            return  # user already configured one
        path = _os.environ.get(
            "SRLA_TPU_XLA_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "srla_tpu",
                          "xla"))
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


_enable_xla_cache()

from .decoder import decode  # noqa: E402
from .encoder import encode  # noqa: E402

__all__ = ["encode", "decode"]
__version__ = "0.1.0"
