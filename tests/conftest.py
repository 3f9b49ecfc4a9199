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
