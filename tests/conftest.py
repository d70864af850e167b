"""Test configuration: run JAX on CPU with 8 virtual devices so the
multi-chip sharding paths (parallel/) are exercised without TPU hardware."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The axon sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon, so the env var alone is too late — override via config
# before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys  # noqa: E402
from pathlib import Path  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from ml_audio_restoration_tpu.utils.cache import (  # noqa: E402
    enable_persistent_compile_cache)

enable_persistent_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_PATH = "/root/reference"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def has_reference():
    return os.path.isdir(os.path.join(REFERENCE_PATH, "src"))


def reference_models():
    """Import the upstream PyTorch models (read-only, for golden parity)."""
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from src.models import denoiser, super_resolution, stereo_separator

    return denoiser, super_resolution, stereo_separator
