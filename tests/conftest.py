"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4 item 5 — an
explicit improvement over the reference, which had no multi-device testing).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent XLA compile cache: the suite's wall clock is dominated by
# XLA:CPU compiles of near-identical step programs across test files;
# warm-cache reruns measure >3x faster (e.g. the agent-space battery
# 115s -> 34s). The cache key includes jaxpr + flags, so hits are exact.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# The axon TPU plugin force-appends itself to jax_platforms regardless of the
# environment variable — override explicitly so tests always run on the
# 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_prng_impl", "threefry2x32")
assert jax.default_backend() == "cpu"
assert jax.device_count() == 8, jax.devices()


import gc
import itertools

import pytest

_test_counter = itertools.count(1)


@pytest.fixture(autouse=True)
def _bound_xla_cpu_compiler_state():
    """XLA:CPU segfaults deterministically inside backend_compile_and_load
    once a process accumulates enough compiled programs (reproducible at the
    ~44th test of the agent-space suite; clearing caches every test makes the
    whole file pass). Dropping the executable caches every 20 tests keeps
    the compiler healthy; the handful of recompiles is cheap relative to a
    dead suite."""
    yield
    if next(_test_counter) % 20 == 0:
        jax.clear_caches()
        gc.collect()
