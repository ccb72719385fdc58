"""Test harness config: force the CPU backend with an 8-device virtual mesh.

This environment's sitecustomize imports jax and pins JAX_PLATFORMS=axon (the
remote TPU tunnel) before any user code runs, so plain env vars are too late;
`jax.config.update` still works because backends initialize lazily.  Tests
must NOT run against the tunnel — per-op dispatch over it is ~50s/op eager.
Device tests exercise the same jitted code paths that run on TPU.

Set ZINC_TPU_TEST_TPU=1 to skip the CPU override and run against the real
attached chip (enables tests/test_pallas_kernels.py):

    ZINC_TPU_TEST_TPU=1 python -m pytest tests/test_pallas_kernels.py -q
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("ZINC_TPU_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between modules.

    The suite compiles hundreds of XLA:CPU programs (the device-FS sumcheck
    twins alone are megabytes of JIT code); keeping them all live has
    produced segfaults inside later LLVM compiles (heap/JIT-memory
    exhaustion territory).  Per-module cache clears bound the resident JIT
    state at a small recompile cost."""
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()  # actually release the dropped LoadedExecutables' JIT memory
