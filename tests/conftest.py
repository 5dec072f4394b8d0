import os
import pathlib
import sys

# Tests run on a virtual 8-device CPU mesh; the real TPU is only used by
# bench.py / __graft_entry__ driven externally. (JAX_PLATFORMS may be
# pre-set to a hardware plugin, so force via jax.config at import.)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache for the CPU test backend: interpret-mode
# Pallas programs are large, and a 1-core box pays minutes per shape
# without it (the "prebuilt bitstream" idea of SURVEY §2.1 applied to the
# test suite). Shared with the CLI/bench default cache dir.
from mm2tpu.utils import jaxcache  # noqa: E402  (after platform forcing)

jaxcache.enable()

import pytest  # noqa: E402

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
