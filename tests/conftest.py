"""Test harness: run on CPU with a virtual 8-device mesh for sharding tests.

Must set env before jax initializes (SURVEY.md section 4 implication: the
reference has no unit tests; xmtpu adds per-primitive + golden + synthetic +
multi-device tiers).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in _flags:
    # the VM host masks some CPUID features the XLA:CPU JIT otherwise emits
    # ("machine features ... could lead to execution errors such as SIGILL");
    # unconstrained codegen segfaulted full-suite runs nondeterministically
    # inside backend_compile_and_load — cap the ISA
    _flags = (_flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = _flags

import jax

# the axon TPU plugin's sitecustomize forces jax_platforms="axon,cpu" at
# interpreter start; force it back so tests run on the virtual CPU mesh
jax.config.update("jax_platforms", "cpu")

# the persistent compile cache on this image stores XLA:CPU AOT executables
# built with machine features the host lacks ("+prefer-no-gather ... could
# lead to execution errors such as SIGILL"); loading them has segfaulted a
# full-suite run mid-cache-read.  CPU compiles are cheap — skip the cache.
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np
import pytest

REFERENCE_ASSETS = "/root/reference/assets"


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Full-suite runs on this 2-core VM segfault nondeterministically
    inside XLA:CPU ``backend_compile_and_load`` once hundreds of compiled
    executables accumulate in one process (observed 4x at ~200 tests in;
    never in module-level or `-m "not slow"` runs).  Dropping the compiled
    programs between modules keeps the resident-executable count bounded;
    within-module fixtures still share compilations."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def simple1_Q():
    from xmtpu.io.bin_format import load_matrix_from_bin
    path = os.path.join(REFERENCE_ASSETS, "SIMPLE1", "Q.bin")
    if not os.path.exists(path):
        pytest.skip("SIMPLE1 fixture not available")
    Q, _ = load_matrix_from_bin(path)
    return Q


@pytest.fixture(scope="session")
def simple2_data():
    from xmtpu.io.bin_format import load_matrix_from_bin
    path = os.path.join(REFERENCE_ASSETS, "SIMPLE2", "landmark.bin")
    if not os.path.exists(path):
        pytest.skip("SIMPLE2 fixture not available")
    data, _ = load_matrix_from_bin(path)
    return data


def rng(seed=0):
    return np.random.default_rng(seed)
