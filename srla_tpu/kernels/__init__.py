"""JAX/Pallas TPU fast paths.

Importing this package (which every device code path does before tracing
its first program) configures the persistent XLA compilation cache.  The
setup lives HERE rather than in the top-level ``srla_tpu/__init__`` so that
pure-host usage (backend="exact"/"native") never imports jax at all: the
jax runtime's background threads measurably steal CPU from the host encode
loops on single-core machines (see NOTES.md), and a codec user who never
touches the device path shouldn't pay that tax.
"""

import os as _os


def enable_xla_cache() -> None:
    """Persistent XLA compilation cache (opt out: SRLA_TPU_XLA_CACHE=0).

    First-compile of the device encode programs is minutes through a remote
    TPU link; the cache makes every later process start hot.  Idempotent;
    failures are non-fatal (read-only filesystems, old jax)."""
    if _os.environ.get("SRLA_TPU_XLA_CACHE", "1") == "0":
        return
    try:
        import jax
        if jax.config.jax_compilation_cache_dir:
            return  # already configured (by us or the user)
        path = _os.environ.get(
            "SRLA_TPU_XLA_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "srla_tpu",
                          "xla"))
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


enable_xla_cache()
