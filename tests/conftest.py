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

# Persistent XLA compile cache: repeat suite runs skip recompilation (the
# ~25-min suite is compile-dominated), and fewer in-process LLVM compiles
# also reduce exposure to a rare XLA-CPU compiler segfault observed on
# long suite runs (full-suite process died inside backend_compile_and_load
# twice; every test passes in isolation).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("TSL_TEST_CACHE", "/tmp/tsl_test_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module. The full suite in
    one process reproducibly segfaults this image's XLA CPU client while
    MATERIALIZING one more executable ~40 tests in -- via fresh compile
    (backend_compile_and_load) AND via persistent-cache deserialization
    (get_executable_and_time) alike -- while every module passes in
    isolation, i.e. the crash tracks accumulated live executables, not any
    particular program. Dropping them between modules keeps the population
    bounded; the persistent compile cache makes the re-loads cheap."""
    yield
    jax.clear_caches()
