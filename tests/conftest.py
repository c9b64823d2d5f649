"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run against
an 8-device CPU platform (same XLA partitioner, same collectives).
Must run before jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# In the dev container an `axon` TPU plugin registers itself from
# sitecustomize before conftest runs, and env-var overrides are too late —
# but the live config switch still works (the CPU backend initializes
# lazily, after the XLA_FLAGS above).
import jax

if os.environ.get("EC504_TPU_TESTS", "") != "1":
    jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden_dir() -> pathlib.Path:
    return GOLDEN


@pytest.fixture(scope="session")
def fixture_frames() -> dict[str, np.ndarray]:
    """The 3 unique fixture images, stb-decoded RGB (golden from reference)."""
    with np.load(GOLDEN / "fixture_rgb.npz") as z:
        return {k: z[k] for k in z.files}


@pytest.fixture(scope="session")
def golden_mpeg() -> bytes:
    return (GOLDEN / "awesome_video.mpeg").read_bytes()


@pytest.fixture(scope="session")
def frame_order() -> list[str]:
    import json

    return json.loads((GOLDEN / "frame_order.json").read_text())["unique_ids"]


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(20260817)
