"""Test configuration: run on CPU (8 virtual devices) with x64 enabled.

Mirrors the reference test strategy (SURVEY.md §4): the same kernels run on a
"CPU backend in float64" for numerically exact gradient checking — here via
JAX's CPU backend + Pallas interpret mode, with an 8-device virtual mesh for
multi-chip sharding tests.

Note: the axon sitecustomize imports jax at interpreter start, so environment
variables are too late here — use jax.config.update instead (it works until
the backend is first used).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: interpret-mode Pallas graphs take tens of
# seconds to compile on this 1-CPU machine; caching roughly halves the
# fast tier's wall clock on re-runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
