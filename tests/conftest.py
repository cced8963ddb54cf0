"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(``xla_force_host_platform_device_count``); the real-TPU path is exercised by
``bench.py`` and the driver's compile checks.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # XLA:CPU's parallel-codegen module splitting SIGSEGVs after many large
    # compiles in one process (jaxlib 0.9 thunk runtime; reproducible with
    # the fused graph-construction programs around compile ~20). Disabling
    # the split is stable and barely slower on this 1-core host.
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags
# Force CPU: the driver environment presets JAX_PLATFORMS=axon (the real-TPU
# tunnel); tests must not compete for the single shared chip.
os.environ["JAX_PLATFORMS"] = "cpu"
# NO persistent compile cache for CPU tests: XLA:CPU AOT cache entries bake
# in the compiling machine's feature set; loading them on a host with fewer
# features (this sandbox) SIGSEGVs inside cpu_aot_loader. Compilation is
# redone per process, which is slow but safe.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

# pytest plugins (jaxtyping) import jax before this conftest runs, so jax's
# config snapshot of JAX_PLATFORMS predates the env override above. Backends
# initialize lazily, so updating the config here still wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", None)
assert jax.devices()[0].platform == "cpu", "tests must run on virtual CPU devices"
assert len(jax.devices()) >= 8, "xla_force_host_platform_device_count must apply"

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_kernels_between_modules():
    """XLA:CPU segfaults once a process accumulates enough live compiled
    code (jaxlib 0.9; reproducible at ~60-70 suite tests with the fused
    graph-construction programs). Dropping executables between test modules
    keeps the live-code volume bounded; shared kernels recompile in the next
    module, which costs seconds and crashes never."""
    yield
    jax.clear_caches()


# Modules whose tests EACH compile several large device-build programs
# (per-dtype fused construction, bulk deletes): clear after EVERY test
# there. Everywhere else a bounded counter clears every few tests — the
# per-module clear alone is not enough (full-suite SIGSEGVs observed
# inside test_hnsw_dtypes_depth at ~23% and near test_pallas_topk at
# ~45%: the live-code limit is cumulative and reachable between module
# boundaries). test_sharding carries its own identical per-test fixture.
_HEAVY_COMPILE_MODULES = {
    "test_hnsw_dtypes_depth",
    "test_hnsw_device_build",
    "test_svs_device_build",
}
_CLEAR_EVERY = 4
_test_count = {"n": 0}


@pytest.fixture(autouse=True)
def _drop_compiled_kernels_periodic(request):
    yield
    _test_count["n"] += 1
    mod = getattr(request, "module", None)
    if (mod is not None and mod.__name__ in _HEAVY_COMPILE_MODULES) or (
        _test_count["n"] % _CLEAR_EVERY == 0
    ):
        jax.clear_caches()
