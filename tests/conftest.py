"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(``xla_force_host_platform_device_count``); the real-TPU path is exercised by
``bench.py`` and the driver's compile checks.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = flags
# Force CPU: the driver environment presets JAX_PLATFORMS=axon (the real-TPU
# tunnel); tests must not compete for the single shared chip.
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache: reruns skip XLA compilation of unchanged kernels.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# pytest plugins (jaxtyping) import jax before this conftest runs, so jax's
# config snapshot of JAX_PLATFORMS predates the env override above. Backends
# initialize lazily, so updating the config here still wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.devices()[0].platform == "cpu", "tests must run on virtual CPU devices"
assert len(jax.devices()) >= 8, "xla_force_host_platform_device_count must apply"
