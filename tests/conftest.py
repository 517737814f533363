"""Test configuration: force an 8-device virtual CPU platform so
multi-chip sharding logic is exercised without TPU hardware (the same
mechanism the driver uses for the multichip dry-run)."""

import os

# Must be set before jax initializes a backend. Force CPU even though
# the session's sitecustomize registers the axon TPU plugin and
# overrides jax_platforms: tests must be deterministic and exercise the
# virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def ascii_text(rng, size):
    """Random 7-bit ASCII-ish text with realistic letter frequencies."""
    letters = np.frombuffer(b" eetaoinshrdlcumwfgypbvk.,\n", dtype=np.uint8)
    return rng.choice(letters, size=size).tobytes()


@pytest.fixture
def text_1k(rng):
    return ascii_text(rng, 1024)


@pytest.fixture
def text_200k(rng):
    return ascii_text(rng, 200 * 1024)
