"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
tests work without TPU hardware (SURVEY.md §4 test plan)."""

import os

# Must be set before jax initializes its backends. Clearing
# PALLAS_AXON_POOL_IPS prevents the environment's sitecustomize from
# registering the axon TPU plugin (which otherwise overrides JAX_PLATFORMS).
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

GOATS_PICKLE = "/root/reference/examples/goats_14_data/goats_14_6_2002_15_20.pkl"
MANHATTAN_PICKLE = "/root/reference/examples/manhattan/factor_graph.pickle"
GOATS_GT_TUM = "/root/reference/examples/goats_14_data/gt_traj_A.tum"


@pytest.fixture(scope="session")
def goats_fg():
    from score_tpu.fg import parse_pickle_file

    return parse_pickle_file(GOATS_PICKLE)


@pytest.fixture(scope="session")
def manhattan_fg():
    from score_tpu.fg import parse_pickle_file

    return parse_pickle_file(MANHATTAN_PICKLE)
