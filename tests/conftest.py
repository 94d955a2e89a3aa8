"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
tests work without TPU hardware (SURVEY.md §4 test plan).

The axon sitecustomize in this environment registers the TPU PJRT plugin
at interpreter startup and pins ``jax_platforms`` to the axon backend —
before pytest ever imports this conftest — so merely mutating
``os.environ`` here is too late. But jax *backends* initialize lazily, so
overriding the platform through ``jax.config`` at conftest-import time
(before any test triggers backend initialization) reliably lands the
whole suite on the 8-device CPU mesh. (A re-exec would also work but
loses pytest's captured output fds.)
"""

import os

flags = [
    f
    for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
os.environ["XLA_FLAGS"] = " ".join(
    flags + ["--xla_force_host_platform_device_count=8"]
)
# Belt and braces for any subprocesses tests may spawn.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "test bootstrap failed: jax initialized a non-CPU backend before "
    "conftest could pin the platform — run pytest with "
    "PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu "
    "XLA_FLAGS=--xla_force_host_platform_device_count=8 exported"
)
assert len(jax.devices()) == 8, "expected the virtual 8-device CPU mesh"

import pytest  # noqa: E402

# Fast modules (no GOATS-scale IPM compiles): `pytest -m smoke` runs in a
# few minutes and keeps the habit alive between the ~45-min full runs.
_SMOKE_MODULES = {
    "test_dd",
    "test_twofloat",
    "test_cones",
    "test_circles",
    "test_utils",
    "test_fg_io",
    "test_native",
    "test_pallas_blocks",
    "test_pcr_tf",
    "test_assembly",
    "test_ozaki",
    "test_aotcache",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables():
    """Free compiled executables between test modules.

    One long pytest process accumulates hundreds of XLA:CPU compiles; the
    compiler has been observed to segfault partway through the suite
    (inside backend_compile_and_load, reproducibly around the ~90th test,
    while the same test passes standalone). Releasing executables between
    modules keeps the compiler's resident state bounded.
    """
    yield
    jax.clear_caches()


from score_tpu.datasets import (  # noqa: E402
    goats_gt_tum_path,
    goats_pickle_path,
    manhattan_pickle_path,
)

GOATS_PICKLE = goats_pickle_path()
MANHATTAN_PICKLE = manhattan_pickle_path()
GOATS_GT_TUM = goats_gt_tum_path()


@pytest.fixture(scope="session")
def goats_fg():
    from score_tpu.fg import parse_pickle_file

    return parse_pickle_file(GOATS_PICKLE)


@pytest.fixture(scope="session")
def manhattan_fg():
    from score_tpu.fg import parse_pickle_file

    return parse_pickle_file(MANHATTAN_PICKLE)
