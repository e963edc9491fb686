"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU hardware — `jax.sharding` semantics are identical), so the env
must be set before jax is imported anywhere.
"""

import os
import sys

# Force the CPU platform with 8 virtual devices.  NOTE: the environment may
# pre-import jax (sitecustomize) with a TPU platform pinned via env var, so
# plain os.environ.setdefault is not enough — update both the env and the
# live jax config before any backend is instantiated.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Persistent compilation cache: the while-loop solver bodies are expensive to
# compile on the CPU backend; cache across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

REFERENCE_DIR = "/root/reference"
EXAMPLE_DIR = os.path.join(REFERENCE_DIR, "example")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def example_dir():
    if not os.path.isdir(EXAMPLE_DIR):
        pytest.skip("reference example/ data not available")
    return EXAMPLE_DIR


@pytest.fixture(scope="session")
def example_data(example_dir):
    from pqp_for_mpc_tpu.io import load_example_dir
    return load_example_dir(example_dir)
