"""Compiled-on-TPU smoke tests for every Pallas kernel.

CI runs the suite on a virtual CPU mesh where Pallas kernels execute in
interpret mode — which validates semantics but NOT Mosaic compilation
(round 2 shipped an any-hit kernel that passed interpret tests and failed
to compile on hardware). These tests compile and run the real kernels and
are skipped unless a TPU backend is present:

    MCPT_TEST_TPU=1 python -m pytest tests/test_tpu_hw.py -q
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU backend"
)


@pytest.fixture(scope="module")
def soup():
    """Small random triangle soup + treelets + brute-force oracle arrays."""
    from mcpt_tpu.ops.bvh import build_bvh_arrays
    from mcpt_tpu.ops.treelets import build_treelets

    T, R = 3000, 512
    rng = np.random.default_rng(7)
    base = rng.uniform(-5, 5, (T, 3))
    e1 = rng.normal(size=(T, 3)) * 0.4
    e2 = rng.normal(size=(T, 3)) * 0.4
    nodes, perm = build_bvh_arrays(base, e1, e2)
    v0, e1, e2 = base[perm], e1[perm], e2[perm]
    ts = build_treelets(v0, e1, e2, nodes)
    o = jnp.asarray(rng.uniform(-6, 6, (R, 3)), jnp.float32)
    d = rng.normal(size=(R, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    return ts, v0, e1, e2, o, d


class _FakeScene:
    def __init__(self, ts):
        self.treelets = ts


def _dense_scene(v0, e1, e2):
    from mcpt_tpu.scene import Geometry, Scene

    T = v0.shape[0]
    g = Geometry(
        v0=jnp.asarray(v0, jnp.float32), e1=jnp.asarray(e1, jnp.float32),
        e2=jnp.asarray(e2, jnp.float32),
        vn=jnp.zeros((T, 3, 3), jnp.float32),
        uv=jnp.zeros((T, 3, 2), jnp.float32),
        mat_id=jnp.zeros((T,), jnp.int32), area=jnp.ones((T,), jnp.float32),
    )
    return Scene(geom=g, mats=None, atlas=None, light_tris=None, camera=None)


@requires_tpu
def test_closest_kernel_compiles_and_matches_bruteforce(soup):
    from mcpt_tpu.ops.intersect import closest_hit_bruteforce
    from mcpt_tpu.ops.pallas.traverse import closest_hit_treelets

    ts, v0, e1, e2, o, d = soup
    ref = closest_hit_bruteforce(_dense_scene(v0, e1, e2), o, d)
    got = closest_hit_treelets(_FakeScene(ts), o, d, interpret=False)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))


@requires_tpu
def test_any_kernel_compiles_and_matches_bruteforce(soup):
    from mcpt_tpu.ops.intersect import any_hit_bruteforce
    from mcpt_tpu.ops.pallas.traverse import any_hit_treelets

    ts, v0, e1, e2, o, d = soup
    rng = np.random.default_rng(1)
    t_max = jnp.asarray(rng.uniform(0.5, 8.0, o.shape[0]), jnp.float32)
    ref = any_hit_bruteforce(_dense_scene(v0, e1, e2), o, d, t_max=t_max)
    got = any_hit_treelets(_FakeScene(ts), o, d, t_max=t_max, interpret=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@requires_tpu
def test_woop_dense_matches_bruteforce_on_hw(soup):
    """The small-scene dense path (XLA Woop matmul) on the real MXU: the
    HIGHEST-precision 6-pass decomposition must reproduce the exact
    Moller-Trumbore accept set (tri indices bitwise equal)."""
    from mcpt_tpu.ops.intersect import (
        any_hit_bruteforce,
        any_hit_woop,
        closest_hit_bruteforce,
        closest_hit_woop,
    )

    ts, v0, e1, e2, o, d = soup
    scene = _dense_scene(v0, e1, e2)
    ref = closest_hit_bruteforce(scene, o, d)
    got = closest_hit_woop(scene, o, d)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    ra = any_hit_bruteforce(scene, o, d, t_max=jnp.float32(6.0))
    ga = any_hit_woop(scene, o, d, t_max=jnp.float32(6.0))
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(ra))


@requires_tpu
def test_fused_woop_kernel_compiles_and_matches(soup):
    """The fused VMEM Woop kernel (ops/pallas/woop) compiled by Mosaic:
    HIGHEST-precision in-kernel matmul must reproduce the XLA accept set
    exactly (round 4 measured bitwise-equal t on 32k veach rays)."""
    from mcpt_tpu.ops.intersect import closest_hit_woop
    from mcpt_tpu.ops.pallas.woop import closest_hit_woop_fused

    ts, v0, e1, e2, o, d = soup
    scene = _dense_scene(v0, e1, e2)
    ref = closest_hit_woop(scene, o, d)
    got = closest_hit_woop_fused(scene, o, d, interpret=False)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))


@requires_tpu
def test_fused_any_kernel_matches_on_hw(soup):
    """Any-hit side of the fused kernel, incl. the round-5 SMEM chunk-mask
    pre-pass (a wrongly-culled chunk would flip occlusion bits)."""
    from mcpt_tpu.ops.intersect import any_hit_woop
    from mcpt_tpu.ops.pallas.woop import any_hit_woop_fused

    ts, v0, e1, e2, o, d = soup
    scene = _dense_scene(v0, e1, e2)
    ref = any_hit_woop(scene, o, d, t_max=jnp.float32(6.0))
    got = any_hit_woop_fused(scene, o, d, t_max=jnp.float32(6.0),
                             interpret=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@requires_tpu
def test_schedule_kernel_matches_voted_on_hw(soup):
    """The schedule-fed traversal experiment (ops/pallas/schedule) must
    stay bitwise-equal to the voted kernel — including its exact fallback
    for truncated tiles (the 512-ray batch over 3000 tris truncates
    plenty at V=512)."""
    from mcpt_tpu.ops.pallas.schedule import (
        any_hit_schedule,
        closest_hit_schedule,
    )
    from mcpt_tpu.ops.pallas.traverse import (
        any_hit_treelets,
        closest_hit_treelets,
    )

    ts, v0, e1, e2, o, d = soup
    scene = _FakeScene(ts)
    ref = closest_hit_treelets(scene, o, d)
    got = closest_hit_schedule(scene, o, d)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    ra = any_hit_treelets(scene, o, d, t_max=6.0)
    ga = any_hit_schedule(scene, o, d, t_max=6.0)
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(ra))
