"""Test bootstrap: force a virtual 8-device CPU mesh before JAX imports.

This is the TPU-native equivalent of a fake-cluster backend — 8 host
devices exercise the same jit/sharding/psum code paths as a v5e-8 slice
(SURVEY.md §4).
"""

import os

# Force CPU even when the ambient env points at a TPU. NOTE: the axon
# environment re-exports JAX_PLATFORMS=axon at interpreter startup, so the
# env var alone is NOT enough — the jax.config update below is what actually
# wins. The XLA flag provides the 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

# Persistent XLA compilation cache: this host has ONE cpu core and model
# compiles dominate suite time; repeat runs hit the cache and finish far
# faster. (.jax_cache is gitignored.)
import jax

jax.config.update("jax_platforms", "cpu")  # beats the ambient axon override
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) >= 8, jax.devices()
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
