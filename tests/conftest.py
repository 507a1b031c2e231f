import os

# Tests run on a virtual 8-device CPU mesh: sharding logic is validated
# without TPU hardware, and the TPU tunnel's dispatch latency is avoided.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

# The axon TPU plugin in this environment overrides JAX_PLATFORMS, so force
# the platform through the config API before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
