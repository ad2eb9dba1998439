"""Test harness setup.

Forces an 8-virtual-device CPU backend (the TPU-world "fake backend" for
sharding tests, SURVEY.md §4) before JAX is imported anywhere.
"""

import os
import sys
from pathlib import Path

# Force CPU with 8 virtual devices. The image's sitecustomize imports jax at
# interpreter boot with JAX_PLATFORMS=axon (real TPU), so env vars alone are
# too late — switch the platform through jax.config after setting XLA_FLAGS
# (the CPU client initializes lazily, so the flag still applies).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import pytest  # noqa: E402


@pytest.fixture
def tmp_cwd(tmp_path, monkeypatch):
    """Run a test from a temp working directory."""
    monkeypatch.chdir(tmp_path)
    return tmp_path


@pytest.fixture(autouse=True)
def _reset_run_dirs_cache():
    """Run-dirs cache is a process singleton; isolate tests."""
    from pixel_heal_thyself_tpu.config.run_dirs import reset_run_dirs_cache

    reset_run_dirs_cache()
    yield
    reset_run_dirs_cache()
