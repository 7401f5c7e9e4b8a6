import os

# Force CPU with a virtual 8-device mesh for sharding tests; the real TPU is
# reserved for bench runs.
# Unconditional: the ambient environment may point JAX at the real TPU
# (JAX_PLATFORMS=axon); tests must stay on host CPU.  This jax build ignores
# the JAX_PLATFORMS env var (the axon plugin sets jax_platforms
# programmatically), so force it through the config API before any backend
# initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import pytest
import numpy as np


@pytest.fixture(scope="session")
def fixtures_dir():
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)
