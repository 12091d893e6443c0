"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/collective paths are
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; bench.py runs on the real chip).

Note: the environment pre-sets JAX_PLATFORMS=axon (TPU tunnel) which
wins over env-var overrides, so we force the platform through
jax.config before any backend is initialised.
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
