"""Test config: force CPU backend with 8 virtual devices for sharding tests.

Must run before jax is imported anywhere (SURVEY.md §4: the reference has no
tests; our pyramid is golden-vector unit tests per kernel + end-to-end
round-trips + mesh logic on virtual devices).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A plugin may have imported jax before this conftest ran, baking the env
# default in; force the config directly (backends init lazily, so this is
# still early enough).
jax.config.update("jax_platforms", "cpu")

# Persistent on-disk compilation cache (suite-time hygiene).  Two wins:
# (a) the per-module `jax.clear_caches()` below (LLVM-segfault workaround)
# forces recompiles of programs shared across modules — with the disk cache
# those become deserialize hits instead of fresh XLA:CPU compiles, within a
# single cold run; (b) repeat runs (dev inner loop, CI with a cached dir)
# skip backend compilation entirely.  Tracing/lowering still runs on a hit,
# so the saving is the backend-compile share only (~20-30% measured on the
# compile-heavy modules).  Opt out or redirect with JAX_COMPILATION_CACHE_DIR.
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    _cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs():
    """Free each module's compiled executables when the module finishes.

    A full-suite run accumulates hundreds of XLA:CPU executables in one
    process; past roughly half the suite the next large compile segfaults
    inside LLVM (observed repeatedly at test_receiver.py's folded-fused
    test in full-suite runs, while every file passes standalone and any
    4-file subset passes).  Dropping jax's caches between modules keeps
    the JIT arena bounded; it costs a few recompiles of programs shared
    across files.
    """
    yield
    jax.clear_caches()
