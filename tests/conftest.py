"""Test environment: force CPU with 8 virtual devices BEFORE jax is imported,
so sharding tests exercise a multi-device mesh without TPU hardware
(SURVEY.md §4 'distributed without a cluster')."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment pre-sets jax_platforms to "axon,cpu" (TPU tunnel); the env
# var alone doesn't override it, so force CPU explicitly for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
jax.config.update("jax_default_matmul_precision", "highest")
