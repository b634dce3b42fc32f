"""Test env: force an 8-device virtual CPU mesh so multi-chip sharding logic
is exercised without TPU hardware (SURVEY.md §4: 1-vs-N device parity tests).

The axon sitecustomize imports jax and registers the TPU plugin at interpreter
start, so env vars alone are too late here — we must also flip the platform
config after import.
"""

import os

# Must land before the CPU client is first used.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: model-graph compiles dominate test wall-clock.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
