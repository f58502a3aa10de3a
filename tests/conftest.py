"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding is validated on virtual CPU devices (real multi-chip
hardware is not available in CI); the bench path uses the real TPU chip.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the harness env pins axon (real TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# float64 for the exact math-invariant tests (the reference asserts exact
# colorspace/DCT round-trips in its self-test); production TPU paths use
# float32/bfloat16.
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the suite is compile-dominated otherwise
jax.config.update("jax_compilation_cache_dir", "/tmp/tiler_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
