"""Test bootstrap: force a virtual 8-device CPU mesh before JAX imports.

This is the TPU-native equivalent of a fake-cluster backend — 8 host
devices exercise the same jit/sharding/psum code paths as a v5e-8 slice
(SURVEY.md §4).
"""

import os

# Force CPU even when the ambient env points at a TPU (JAX_PLATFORMS=axon):
# tests must be deterministic and exercise the virtual multi-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference/yolo_scratch_cuda")

if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def _reference_available() -> bool:
    return REFERENCE.is_dir()


@pytest.fixture(scope="session")
def reference_path():
    """Path to the read-only reference checkout (golden-parity tests only)."""
    if not _reference_available():
        pytest.skip("reference repo not mounted")
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    return REFERENCE


requires_reference = pytest.mark.skipif(
    not _reference_available(), reason="reference repo not mounted"
)
