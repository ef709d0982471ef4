"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is tested on
host-platform virtual devices (SURVEY.md §4.5). Must run before jax import.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import subprocess  # noqa: E402

import pytest  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _ensure_fixtures():
    marker = os.path.join(FIXTURES, "losses_tiny.json")
    if not os.path.exists(marker):
        tools = os.path.join(os.path.dirname(__file__), "..", "tools",
                             "make_golden.py")
        subprocess.run([sys.executable, tools, "--tag", "tiny"], check=True)


@pytest.fixture(scope="session")
def fixtures_dir():
    _ensure_fixtures()
    return FIXTURES
