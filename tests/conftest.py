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
# persistent compilation cache: the suite's dominant cost is
# recompiling near-identical tracker variants per module — warm runs
# are ~2x faster (measured: test_fast_tracker 110s -> 58s)
jax.config.update("jax_compilation_cache_dir", "/tmp/kintinuous_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
