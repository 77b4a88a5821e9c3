import os
import sys

# Run JAX-dependent tests on a virtual 8-device CPU mesh. The container's
# sitecustomize force-registers the axon TPU backend and overrides
# JAX_PLATFORMS, so we must update the config after importing jax.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
