"""Test config: run JAX on a virtual 8-device CPU mesh (SURVEY.md §4: multi-
host logic is tested single-host with forced host platform device count)."""

import os

# Must run before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

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
