import os

# Tests run on a virtual 8-device CPU mesh; the real TPU is only used by
# bench.py / __graft_entry__ driven externally. (JAX_PLATFORMS may be
# pre-set to a hardware plugin, so force via jax.config at import.)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GOLDEN = REPO / "tests" / "golden"
REF_TEST = pathlib.Path("/root/reference/test")


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN


@pytest.fixture(scope="session")
def ref_test_dir():
    if not REF_TEST.exists():
        pytest.skip("reference test data unavailable")
    return REF_TEST
