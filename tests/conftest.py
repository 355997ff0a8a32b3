"""Test configuration: force an 8-device virtual CPU platform.

Tests must run without TPU hardware; multi-chip sharding tests use the
virtual device mesh. These env vars must be set before jax initializes.

TPU_VO_TEST_TPU=1 opts OUT of the CPU override and runs tests on the
machine's default (TPU) backend instead — that is how the TPU-gated tests
(test_stage1_approx.py, test_pallas_shapes.test_select_lowers_on_tpu)
execute; under the default CPU platform they self-skip.

NOTE: the float64 golden-parity tests (se3/geometry/estimation vs
OpenCV's float64 math) are CPU-ONLY BY DESIGN — that is why this file
enables x64 on the CPU platform. Running the FULL suite on the TPU
(f32/bf16 production dtypes) fails ~119 of them on precision alone
(measured round 4); the TPU leg therefore runs the dtype-robust
TPU-relevant subset (tools/run_tpu_test_leg.TPU_LEG_TEST_FILES) and
records benchmarks/tpu_test_log.json.
"""

import os

_ON_TPU = os.environ.get("TPU_VO_TEST_TPU") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    # Golden-parity tests compare against OpenCV's float64 math; the
    # production TPU path is float32/bfloat16 (all tpu_vo code is
    # dtype-polymorphic).
    os.environ["JAX_ENABLE_X64"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# jax may already be imported (and pointed at an accelerator) by site
# customization before this conftest runs, so override via config too.
if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the pipeline graphs (8-level ORB + RANSAC)
# are expensive to compile on CPU; cache them across test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


# The full suite compiles hundreds of XLA:CPU executables whose mappings
# accumulate toward vm.max_map_count (default 65530): measured round 5,
# /proc/self/maps grew past 26k within minutes and the suite
# deterministically SEGFAULTED inside scan tracing at ~93% (the mmap
# failure surfaces as a segv in native code, not a Python error; any
# subset of the suite passes because no subset crosses the limit).
# Clearing jax's in-process caches unmaps retired executables; the
# persistent compile cache (jax_compilation_cache_dir above) keeps the
# recompiles cheap. Only fires when mappings actually grow large, so
# warm small runs pay nothing.
_MAPS_LIMIT = 30000


def _n_mappings() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


@pytest.fixture(autouse=True, scope="module")
def _bound_process_mappings():
    yield
    if _n_mappings() > _MAPS_LIMIT:
        jax.clear_caches()
