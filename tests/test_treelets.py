"""Pallas treelet traversal (ops/pallas/traverse + ops/treelets) equivalence.

Contract: closest_hit_treelets returns the dense
reference's hit (same accept predicate, lowest-tri-id tie break) and
any_hit_treelets matches the inclusive any-hit predicate. Runs the kernel
in interpret mode on the CPU mesh; the real-TPU path is exercised by
tools/bench_traverse.py and bench.py.

Also validates the two-level layout builder itself: exact subtree AABBs,
full triangle coverage, and slot padding invariants.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from mcpt_tpu.ops.bvh import build_bvh_arrays
from mcpt_tpu.ops.intersect import any_hit_bruteforce, closest_hit_bruteforce
from mcpt_tpu.ops.pallas.traverse import (
    any_hit_treelets,
    closest_hit_treelets,
)
from mcpt_tpu.ops.treelets import build_treelets


@dataclasses.dataclass
class _FakeScene:
    treelets: object
    geom: object = None


def _rand_soup(rng, T, spread=5.0, tri_size=0.8):
    base = rng.uniform(-spread, spread, (T, 3))
    e1 = rng.normal(size=(T, 3)) * tri_size
    e2 = rng.normal(size=(T, 3)) * tri_size
    return base, e1, e2


def _rand_rays(rng, R, spread=6.0):
    o = rng.uniform(-spread, spread, (R, 3))
    d = rng.normal(size=(R, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def _dense_scene(v0, e1, e2):
    from mcpt_tpu.scene import Geometry, Scene

    T = v0.shape[0]
    g = Geometry(
        v0=jnp.asarray(v0, jnp.float32),
        e1=jnp.asarray(e1, jnp.float32),
        e2=jnp.asarray(e2, jnp.float32),
        vn=jnp.zeros((T, 3, 3), jnp.float32),
        uv=jnp.zeros((T, 3, 2), jnp.float32),
        mat_id=jnp.zeros((T,), jnp.int32),
        area=jnp.ones((T,), jnp.float32),
    )
    return Scene(
        geom=g, mats=None, atlas=None, light_tris=None, camera=None
    )


def _build(rng, T, c=16, s_b=8):
    """BVH-ordered soup + treelet layout with tiny c/s_b to force deep
    two-level structure even for small T."""
    v0, e1, e2 = _rand_soup(rng, T)
    nodes, perm = build_bvh_arrays(v0, e1, e2, use_native=False)
    v0, e1, e2 = v0[perm], e1[perm], e2[perm]
    ts = build_treelets(v0, e1, e2, nodes, c=c, s_b=s_b)
    return v0, e1, e2, ts


def test_layout_invariants():
    rng = np.random.default_rng(3)
    v0, e1, e2, ts = _build(rng, 700, c=16, s_b=8)
    tri = np.asarray(ts.tri)
    ids = tri[:, 9, :].view(np.int32)
    real = ids < 2**30
    # every triangle appears exactly once
    got = np.sort(ids[real])
    assert np.array_equal(got, np.arange(700))
    # triangle data round-trips
    flat_ids = ids[real]
    v0r = tri[:, 0:3, :].transpose(0, 2, 1)[real]
    assert np.allclose(v0r, v0[flat_ids], atol=0)
    # treelet AABBs contain their triangles
    blk = np.asarray(ts.blk_box)
    ns, _, s_b = blk.shape
    for g in range(ns * s_b):
        s, k = divmod(g, s_b)
        m = real[g]
        if not m.any():
            continue
        tid = ids[g][m]
        p0 = v0[tid]
        p1 = p0 + e1[tid]
        p2 = p0 + e2[tid]
        lo = np.minimum(np.minimum(p0, p1), p2).min(axis=0)
        hi = np.maximum(np.maximum(p0, p1), p2).max(axis=0)
        assert (blk[s, 0:3, k] <= lo + 1e-5).all()
        assert (blk[s, 3:6, k] >= hi - 1e-5).all()
        assert blk[s, 6, k] > 0  # valid flag


@pytest.mark.parametrize("T,R", [(120, 64), (400, 128)])
def test_closest_matches_bruteforce(T, R):
    rng = np.random.default_rng(T + R)
    v0, e1, e2, ts = _build(rng, T, c=16, s_b=8)
    dense = _dense_scene(v0, e1, e2)
    fake = _FakeScene(treelets=ts)
    org, dirn = _rand_rays(rng, R)

    ref = closest_hit_bruteforce(dense, org, dirn)
    got = closest_hit_treelets(fake, org, dirn, ray_tile=64, interpret=True)

    ref_tri = np.asarray(ref.tri)
    got_tri = np.asarray(got.tri)
    same = ref_tri == got_tri
    # f32 rounding at accept boundaries may flip a rare hit; everything
    # else must agree exactly (incl. tie-breaks)
    assert same.mean() > 0.995, f"tri mismatch {(~same).sum()}/{R}"
    both = same & (ref_tri >= 0)
    assert np.allclose(
        np.asarray(ref.t)[both], np.asarray(got.t)[both], rtol=1e-5
    )


def test_closest_respects_t_bounds():
    rng = np.random.default_rng(9)
    v0, e1, e2, ts = _build(rng, 150, c=16, s_b=8)
    dense = _dense_scene(v0, e1, e2)
    fake = _FakeScene(treelets=ts)
    org, dirn = _rand_rays(rng, 64)
    t_max = 3.0
    ref = closest_hit_bruteforce(dense, org, dirn, t_max=t_max)
    got = closest_hit_treelets(
        fake, org, dirn, t_max=t_max, ray_tile=64, interpret=True
    )
    same = np.asarray(ref.tri) == np.asarray(got.tri)
    assert same.mean() > 0.995


@pytest.mark.parametrize("T,R", [(120, 64)])
def test_any_matches_bruteforce(T, R):
    rng = np.random.default_rng(7 * T + R)
    v0, e1, e2, ts = _build(rng, T, c=16, s_b=8)
    dense = _dense_scene(v0, e1, e2)
    fake = _FakeScene(treelets=ts)
    org, dirn = _rand_rays(rng, R)
    # shadow-ray style finite per-ray t_max
    t_max = jnp.asarray(rng.uniform(0.5, 8.0, R), jnp.float32)

    ref = any_hit_bruteforce(dense, org, dirn, t_max=t_max)
    got = any_hit_treelets(fake, org, dirn, t_max=t_max, ray_tile=64,
                           interpret=True)
    same = np.asarray(ref) == np.asarray(got)
    assert same.mean() > 0.995, f"any-hit mismatch {(~same).sum()}/{R}"


def test_ragged_ray_count_padding():
    rng = np.random.default_rng(11)
    v0, e1, e2, ts = _build(rng, 120, c=16, s_b=8)
    dense = _dense_scene(v0, e1, e2)
    fake = _FakeScene(treelets=ts)
    org, dirn = _rand_rays(rng, 45)  # not a multiple of the tile
    ref = closest_hit_bruteforce(dense, org, dirn)
    got = closest_hit_treelets(fake, org, dirn, ray_tile=64, interpret=True)
    assert (np.asarray(ref.tri) == np.asarray(got.tri)).mean() > 0.99


def test_slim_expand_matches_dense_expand(cornell_scene_bvh):
    """expand_hit_uv (kernel u/v + 17-col table) must reproduce
    expand_hit (36-col table + barycentric recompute) on real hits."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mcpt_tpu.ops.bvh import build_bvh_arrays
    from mcpt_tpu.ops.pallas.traverse import closest_hit_treelets
    from mcpt_tpu.ops.treelets import build_treelets
    from mcpt_tpu.render.camera import generate_rays
    from mcpt_tpu.render.integrator import (
        expand_hit,
        expand_hit_uv,
        pack_mat_table,
        pack_shade_table,
        pack_tri_table,
    )
    from mcpt_tpu.utils.rng import per_ray_keys, ray_uniforms

    scene = cornell_scene_bvh
    if scene.treelets is None:
        g = scene.geom
        nodes = {
            k: np.asarray(getattr(scene.bvh, k))
            for k in ["lo", "hi", "first", "count", "skip"]
        }
        ts = build_treelets(
            np.asarray(g.v0), np.asarray(g.e1), np.asarray(g.e2), nodes
        )
        scene = dataclasses.replace(scene, treelets=ts)

    R = 96
    key = jax.random.PRNGKey(2)
    # center-of-image pixels (corner rays can miss through the cornell
    # box's open front face)
    W, H = scene.camera.width, scene.camera.height
    pidx = (H // 2) * W + W // 2 + jnp.arange(R, dtype=jnp.int32)
    org, dirn = generate_rays(
        scene.camera, ray_uniforms(per_ray_keys(key, pidx), 0, 2), pidx
    )
    hit = closest_hit_treelets(scene, org, dirn, interpret=True)
    assert hit.u is not None and hit.v is not None
    fat = expand_hit(pack_tri_table(scene), hit, org, dirn)
    slim = expand_hit_uv(
        pack_shade_table(scene), pack_mat_table(scene), hit, org, dirn
    )
    m = np.asarray(hit.valid)
    assert m.any()
    np.testing.assert_allclose(
        np.asarray(slim.point)[m], np.asarray(fat.point)[m],
        rtol=1e-4, atol=1e-3 * float(scene.scale),
    )
    np.testing.assert_allclose(
        np.asarray(slim.normal)[m], np.asarray(fat.normal)[m],
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(slim.uv)[m], np.asarray(fat.uv)[m], rtol=1e-4, atol=1e-5
    )
    for f in ["kd", "ks", "radiance"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(slim, f))[m], np.asarray(getattr(fat, f))[m]
        )
    np.testing.assert_array_equal(
        np.asarray(slim.area)[m], np.asarray(fat.area)[m]
    )
    np.testing.assert_array_equal(
        np.asarray(slim.tex_id)[m], np.asarray(fat.tex_id)[m]
    )
    np.testing.assert_array_equal(
        np.asarray(slim.front)[m], np.asarray(fat.front)[m]
    )
