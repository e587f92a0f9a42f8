"""Test harness config.

Tests run on CPU with 8 virtual devices so mesh-sharded code paths are
exercised without TPU hardware (SURVEY.md §4's improvement slot: real pytest
with jax CPU multi-device simulation). Must run before jax is imported.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: the env pre-sets the
# TPU platform ("axon"), but tests must run on the 8-device virtual CPU mesh
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The TPU harness's sitecustomize force-registers the "axon" TPU platform
# regardless of JAX_PLATFORMS; override it back to CPU at the config level.
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against float64-free torch; keep matmuls exact.
jax.config.update("jax_default_matmul_precision", "highest")

REFERENCE_DIR = "/root/reference"


def pytest_configure(config):
    # `slow` fast-lane split (VERDICT r3 #9): the full suite is tens of
    # minutes on a loaded host; `-m "not slow"` keeps a lane that always
    # gets run. Marked by measured duration (>60 s on this host).
    config.addinivalue_line(
        "markers", "slow: long-running test (full suite only; "
        "deselect with -m 'not slow')")


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_DIR)


def has_torch() -> bool:
    try:
        import torch  # noqa: F401
        return True
    except ImportError:
        return False
