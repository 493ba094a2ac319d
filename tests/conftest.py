"""Test configuration: run JAX on a virtual 8-device CPU mesh with f64.

- CPU: the single real TPU chip is reserved for benches; correctness tests run
  on host with an 8-device virtual platform for sharding tests.
- x64: the reference is float64 NumPy; parity tests compare at f64. Code under
  test passes explicit dtypes, so f32 paths remain exercised where requested.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the SoA simulator/solver graphs are large; caching
# makes repeated test runs fast.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# NOTE: the heavy interpret-mode kernel modules run in their own
# subprocesses via tests/test_isolated_kernel_modules.py (their largest
# compiles segfault XLA:CPU late in a long-lived session; fresh processes
# always pass). No collection reordering is needed — suite order is free.
