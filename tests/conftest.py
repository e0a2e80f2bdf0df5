"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on host CPU devices
(xla_force_host_platform_device_count); real-TPU benchmarking happens
outside the test suite (bench.py).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: kernel shapes recompile once per machine,
# not once per test run.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nimble_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")

import pathlib

import jax
import pytest

# Something in this image programmatically sets jax_platforms to "axon,cpu"
# (remote-TPU tunnel), overriding the JAX_PLATFORMS env var — force CPU before
# any backend initializes so tests never dispatch over the tunnel.
jax.config.update("jax_platforms", "cpu")

DATA_DIR = pathlib.Path(__file__).parent / "data"


@pytest.fixture
def data_dir() -> pathlib.Path:
    return DATA_DIR


def library_path(name: str) -> str:
    return str(DATA_DIR / "libraries" / name)


def reads_path(name: str) -> str:
    return str(DATA_DIR / "reads" / name)
