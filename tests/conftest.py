"""Test configuration: hermetic CPU backend with a virtual 8-device mesh.

Sharding paths are validated without TPU hardware by forcing the host
platform and splitting it into 8 virtual devices (the driver separately
compiles the multi-chip path via __graft_entry__.dryrun_multichip).

Note: the environment may pre-register an external TPU plugin backend that
rewrites ``jax_platforms`` at interpreter startup, so we must override the
*config* after importing jax — the env var alone is not enough.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# persistent compile cache across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
