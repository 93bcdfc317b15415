import os
import sys

# Virtual 8-device CPU mesh for sharding tests; single-chip TPU runs use
# bench.py / __graft_entry__.py instead (see repo README).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize force-selects the TPU platform; pin tests to the
# virtual CPU mesh regardless.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow",
        action="store_true",
        default=False,
        help="run slow full-scale tests (reference-size circuits)",
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: full-scale circuit test")
    config.addinivalue_line(
        "markers",
        "mesh_slow: multi-minute shard_map-compile test on the CPU mesh "
        "(covered by the driver's dryrun_multichip gate; run explicitly "
        "with --run-slow)",
    )
    config.addinivalue_line(
        "markers",
        "kernelmath: interpret-mode REAL-kernel math gate for a "
        "default-on flag (runs in the default suite — a kernel-indexing "
        "regression must fail here, not on hardware at bench time; "
        "deselect with -m 'not kernelmath' for fast logic-only "
        "iteration, ~4 min)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    skip_slow = pytest.mark.skip(reason="needs --run-slow")
    for item in items:
        if "slow" in item.keywords or "mesh_slow" in item.keywords:
            item.add_marker(skip_slow)
