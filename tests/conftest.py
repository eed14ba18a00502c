"""Test env: force CPU with 8 virtual devices BEFORE jax import.

SURVEY.md section 4: pjit/shard_map semantics are tested on a virtual 8-device
CPU mesh (--xla_force_host_platform_device_count=8), the standard JAX way to
validate multi-chip sharding without a real slice. Benchmarks (bench.py) run
on the real TPU chip instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# A sitecustomize hook in some environments registers a TPU PJRT plugin and
# force-sets jax_platforms before conftest runs; the env var alone is then
# too late. Re-assert CPU through jax.config, which wins as long as no
# backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_prng_impl", "threefry2x32")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 virtual CPU devices, got {len(devs)}"
    return devs


@pytest.fixture()
def rng():
    return np.random.RandomState(0)
