"""Test harness: force the CPU backend with 8 virtual devices so sharding
tests run without TPU hardware (the axon sitecustomize registers a remote
TPU backend at interpreter boot; override it before any computation)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
