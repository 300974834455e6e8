"""Test config: force the CPU backend with 8 virtual devices so
sharding/mesh tests run without TPU hardware.

The container's sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel)
before pytest starts, so plain env vars are too late — we must override
through jax.config before any backend is initialized. XLA_FLAGS is still
read lazily at first backend init, so setting it here works."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
