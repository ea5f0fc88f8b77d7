"""Test config: run JAX on a virtual 8-device CPU mesh (SURVEY.md §4: multi-
host logic is tested single-host with forced host platform device count)."""

import os

# Must run before any backend initialization (this environment's
# sitecustomize imports jax and force-registers the axon TPU platform, so the
# JAX_PLATFORMS env var alone is NOT enough — see jax.config.update below).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
# Persistent compile cache: repeated test runs skip XLA compilation.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_akaze_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

# Override the axon plugin's jax_platforms="axon,cpu" (set at registration).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from akaze_tpu.utils.synthetic import textured_scene  # noqa: E402


@pytest.fixture(scope="session")
def small_image() -> np.ndarray:
    """Small but real-ish scene; small enough that golden-model tests are fast."""
    return textured_scene(160, 200, seed=3)


@pytest.fixture(scope="session")
def vga_image() -> np.ndarray:
    return textured_scene(480, 640, seed=0)
