import os

# Tests run on a virtual 8-device CPU mesh: sharding logic is validated
# without TPU hardware, and the TPU tunnel's dispatch latency is avoided.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# The environment pins JAX_PLATFORMS=axon (the TPU tunnel); tests always run
# on the virtual CPU mesh, so override unconditionally before any backend
# initialization.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
