import os

# Tests run on a virtual 8-device CPU mesh: multi-chip sharding logic is
# validated without TPU hardware (the driver separately dry-runs multichip).
#
# Note: this image's sitecustomize registers the TPU ('axon') PJRT plugin at
# interpreter startup, so jax is already imported here and env vars alone are
# not enough -- re-point the platform via jax.config before any computation.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

_platform = os.environ.get("TSL_TEST_PLATFORM", "cpu")
jax.config.update("jax_platforms", _platform)
jax.config.update("jax_enable_x64", True)
