"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run without TPU hardware; multi-chip sharding tests use
``xla_force_host_platform_device_count`` (see SURVEY.md §4).
"""

import os

# Hard override: the surrounding environment may point JAX at a remote TPU
# (JAX_PLATFORMS=axon, registered by a sitecustomize hook that imports jax
# at interpreter boot). Setting the env var is not enough — jax is already
# imported — so force the config directly before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
