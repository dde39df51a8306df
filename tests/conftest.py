"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
--xla_force_host_platform_device_count (the standard JAX CI pattern,
SURVEY §4). This must run before the first `import jax` anywhere.
"""
import os

# Disable the axon TPU plugin (sitecustomize registers it only when
# PALLAS_AXON_POOL_IPS is set) and force an 8-device CPU host platform.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
