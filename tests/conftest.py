"""Test env: force a virtual 8-device CPU platform BEFORE jax import.

This is the fake-backend strategy the reference never had (SURVEY.md §4):
multi-chip sharding tests run on xla_force_host_platform_device_count=8 CPU
devices; the driver separately dry-runs the same code on real hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

# The axon TPU plugin force-sets jax_platforms during registration, so the
# env var alone is not enough — override the config explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
