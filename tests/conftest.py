"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
--xla_force_host_platform_device_count (the standard JAX CI pattern,
SURVEY §4). This must run before the first `import jax` anywhere.
"""
import os
import sys

# Force an 8-device virtual CPU mesh. The TPU (axon) plugin may already be
# registered by sitecustomize at interpreter startup, but the backend is
# initialized lazily — overriding jax_platforms before first device use
# reliably lands on CPU. XLA_FLAGS must be set before the CPU client exists.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# MCPT_TEST_TPU=1 keeps the default (TPU) backend so tests/test_tpu_hw.py
# can smoke-test compiled Pallas kernels on real hardware; everything else
# runs on the virtual CPU mesh either way (kernels fall back to interpret).
if os.environ.get("MCPT_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/mcpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def cornell_scene():
    from mcpt_tpu.io.obj import load_scene

    return load_scene(
        os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell-box.obj"),
        with_bvh=False,
    )


@pytest.fixture(scope="session")
def cornell_scene_bvh():
    from mcpt_tpu.io.obj import load_scene

    return load_scene(
        os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell-box.obj"),
        with_bvh=True,
    )


@pytest.fixture(scope="session")
def veach_scene():
    from mcpt_tpu.io.obj import load_scene

    return load_scene(
        os.path.join(os.path.dirname(__file__), "..", "scenes", "veach-mis.obj"),
        with_bvh=True,
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
