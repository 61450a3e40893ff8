"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's CI seam (tests force device=:CPU,
/root/reference/test/posterior_model.jl:13-16): every kernel must also run on
CPU so the suite needs no TPU. Multi-chip sharding tests use the 8 virtual
devices.
"""

import os

# Must be set before jax import. Force-assign: the shell exports
# JAX_PLATFORMS=axon (the TPU tunnel), so setdefault would silently send the
# whole suite to the TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402

# the axon sitecustomize force-sets jax_platforms="axon,cpu", overriding the
# env var — re-assert the CPU platform for the test suite
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(8418387917544508114 % (2**31))


@pytest.fixture
def rng():
    return np.random.default_rng(42)
