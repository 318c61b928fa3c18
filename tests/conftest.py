"""Test config: run everything on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4).

The session environment pins JAX to the axon TPU tunnel two ways: the
JAX_PLATFORMS env var and a sitecustomize that calls
jax.config.update("jax_platforms", "axon,cpu") at interpreter start. Unit
tests must not depend on (or wait for) TPU hardware, so both are overridden
here before any backend initializes.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
