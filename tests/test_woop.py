"""Woop-transform (MXU) intersection vs Moller-Trumbore and the f64 oracle.

The two dense kernels implement the same accept predicate (ops/intersect.py);
rounding may flip knife-edge rays, so agreement thresholds mirror
tests/test_intersect.py.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from mcpt_tpu.ops.intersect import (
    any_hit_bruteforce,
    any_hit_woop,
    closest_hit_bruteforce,
    closest_hit_woop,
)
from tests.test_intersect import _np_moller_trumbore, _random_tri_scene


@pytest.mark.parametrize("T", [7, 600])
def test_closest_woop_matches_oracle(rng, T):
    scene, v0, e1, e2 = _random_tri_scene(rng, T)
    R = 64
    o = rng.uniform(-2, 2, (R, 3))
    d = rng.normal(size=(R, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    hit = closest_hit_woop(
        scene, jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        t_min=1e-4, chunk=256,
    )
    ot, otri, _ = _np_moller_trumbore(
        v0, e1, e2, o, d, det_eps=1e-5, t_min=1e-4, t_max=np.inf, closed_max=False
    )
    agree = np.asarray(hit.tri) == otri
    assert agree.mean() > 0.95
    sel = agree & (otri >= 0)
    np.testing.assert_allclose(np.asarray(hit.t)[sel], ot[sel], rtol=1e-3)


def test_closest_woop_matches_mt(rng):
    scene, *_ = _random_tri_scene(rng, 300)
    R = 256
    o = rng.uniform(-2, 2, (R, 3))
    d = rng.normal(size=(R, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)

    hw = closest_hit_woop(scene, o, d, t_min=1e-4, chunk=128)
    hm = closest_hit_bruteforce(scene, o, d, t_min=1e-4, chunk=128)
    agree = np.asarray(hw.tri) == np.asarray(hm.tri)
    assert agree.mean() > 0.98  # identical predicate, f32 rounding only
    sel = agree & (np.asarray(hm.tri) >= 0)
    np.testing.assert_allclose(
        np.asarray(hw.t)[sel], np.asarray(hm.t)[sel], rtol=2e-3
    )


def test_any_woop_matches_oracle(rng):
    scene, v0, e1, e2 = _random_tri_scene(rng, 40)
    R = 128
    o = rng.uniform(-2, 2, (R, 3))
    d = rng.normal(size=(R, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = 1.5
    got = np.asarray(
        any_hit_woop(
            scene, jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
            t_min=1e-4, t_max=t_max,
        )
    )
    _, otri, _ = _np_moller_trumbore(
        v0, e1, e2, o, d, det_eps=1e-6, t_min=1e-4, t_max=t_max, closed_max=True
    )
    assert (got == (otri >= 0)).mean() > 0.97


def test_woop_interval_and_degenerate(rng):
    scene, *_ = _random_tri_scene(rng, 1)
    from mcpt_tpu.scene import Geometry

    geom = Geometry(
        v0=jnp.asarray([[-1.0, -1.0, 0.0]]),
        e1=jnp.asarray([[2.0, 0.0, 0.0]]),
        e2=jnp.asarray([[0.0, 2.0, 0.0]]),
        vn=jnp.zeros((1, 3, 3)),
        uv=jnp.zeros((1, 3, 2)),
        mat_id=jnp.zeros((1,), jnp.int32),
        area=jnp.asarray([2.0]),
    )
    sc = dataclasses.replace(scene, geom=geom)
    o = jnp.asarray([[0.0, 0.0, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    assert closest_hit_woop(sc, o, d, t_min=1e-4, t_max=2.0).tri[0] == 0
    assert closest_hit_woop(sc, o, d, t_min=1e-4, t_max=1.0).tri[0] == -1  # open
    assert bool(any_hit_woop(sc, o, d, t_min=1e-4, t_max=1.0)[0])  # closed
    assert not bool(any_hit_woop(sc, o, d, t_min=1e-4, t_max=0.5)[0])

    degen = Geometry(  # zero-area: Woop threshold is +inf, can never accept
        v0=jnp.asarray([[0.0, 0.0, 0.0]]),
        e1=jnp.asarray([[1.0, 0.0, 0.0]]),
        e2=jnp.asarray([[2.0, 0.0, 0.0]]),
        vn=jnp.zeros((1, 3, 3)),
        uv=jnp.zeros((1, 3, 2)),
        mat_id=jnp.zeros((1,), jnp.int32),
        area=jnp.asarray([0.0]),
    )
    sc = dataclasses.replace(scene, geom=degen)
    assert closest_hit_woop(sc, o, d).tri[0] == -1
    assert not bool(any_hit_woop(sc, o, d)[0])


def test_render_image_woop_vs_mt(cornell_scene):
    """Full-render cross-check: the two dense kernels give statistically
    identical images (same seed, same estimator; knife-edge flips only)."""
    import jax

    from mcpt_tpu.render.renderer import RenderConfig, Renderer

    import mcpt_tpu.ops.intersect as I

    def render(algo):
        old = I.DENSE_ALGO
        I.DENSE_ALGO = algo
        # DENSE_ALGO is read at trace time: both renders have identical avals
        # and static args, so without this the second call would reuse the
        # first algorithm's compiled program and never execute its own path.
        jax.clear_caches()
        try:
            r = Renderer(
                cornell_scene,
                RenderConfig(max_bounces=4, width=64, height=64, spp_per_pass=4, seed=0),
            )
            r.step()
            return np.asarray(r.film.accum) / 4.0
        finally:
            I.DENSE_ALGO = old

    a = render("woop")
    b = render("mt")
    # pixel-level: nearly all pixels bitwise-close, means tight
    close = np.isclose(a, b, rtol=1e-3, atol=1e-3).mean()
    assert close > 0.99, f"only {close:.4f} of components close"
    np.testing.assert_allclose(a.mean(axis=(0, 1)), b.mean(axis=(0, 1)), rtol=2e-3)


def test_fused_kernel_matches_xla_woop(rng):
    """ops/pallas/woop (interpret mode) vs the XLA Woop path: identical
    accept set (the kernel runs the same algebra with the same HIGHEST-
    precision projection; chunk culling is conservative)."""
    from mcpt_tpu.ops.pallas.woop import (
        any_hit_woop_fused,
        closest_hit_woop_fused,
    )

    scene, v0, e1, e2 = _random_tri_scene(rng, 600)
    R = 96
    o = rng.uniform(-2, 2, (R, 3))
    d = rng.normal(size=(R, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)

    ref = closest_hit_woop(scene, o, d)
    got = closest_hit_woop_fused(scene, o, d, interpret=True)
    same = np.asarray(ref.tri) == np.asarray(got.tri)
    assert same.mean() > 0.99, (~same).sum()
    sel = same & (np.asarray(ref.tri) >= 0)
    np.testing.assert_array_equal(
        np.asarray(ref.t)[sel], np.asarray(got.t)[sel]
    )
    # kernel-computed u/v match the dense expansion's recomputation
    assert got.u is not None and got.v is not None
    uv_ok = (np.asarray(got.u)[sel] >= -1e-6) & (np.asarray(got.v)[sel] >= -1e-6)
    assert uv_ok.all()

    t_max = jnp.asarray(rng.uniform(0.5, 6.0, R), jnp.float32)
    ra = any_hit_woop(scene, o, d, t_max=t_max)
    ga = any_hit_woop_fused(scene, o, d, t_max=t_max, interpret=True)
    assert (np.asarray(ra) == np.asarray(ga)).mean() > 0.99


def test_fused_kernel_render_matches_xla(cornell_scene, monkeypatch):
    """End-to-end render parity: forcing MCPT_INTERSECT=woop-fused must
    reproduce the default render bitwise (same accept set, same RNG)."""
    import dataclasses as dc

    import jax

    from mcpt_tpu.ops import intersect
    from mcpt_tpu.render.renderer import RenderConfig, Renderer

    scene = cornell_scene
    cam = dc.replace(scene.camera, width=24, height=24)
    scene = dc.replace(scene, camera=cam)

    r1 = Renderer(scene, RenderConfig(max_bounces=4, seed=0))
    r1.step()
    a = np.asarray(r1.film.accum)

    monkeypatch.setattr(intersect, "DENSE_ALGO", "woop-fused")
    r2 = Renderer(scene, RenderConfig(max_bounces=4, seed=0))
    r2.step()
    b = np.asarray(r2.film.accum)
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_fused_mode_defers_to_bvh_walk_on_large_scenes(rng, monkeypatch):
    """MCPT_INTERSECT=woop-fused + a >4096-tri scene whose dispatch takes
    the skip-link BVH walk (no treelets / off-TPU): uses_woop_kernel and
    dispatch_returns_uv must be False (the walk returns Hit without u/v;
    the slim expander would dereference hit.u == None)."""
    import dataclasses as dc

    import numpy as np

    from mcpt_tpu.ops import intersect
    from mcpt_tpu.ops.bvh import build_bvh_arrays
    from mcpt_tpu.scene import FlatBVH

    scene, v0, e1, e2 = _random_tri_scene(rng, 5000)
    nodes, perm = build_bvh_arrays(
        np.asarray(v0), np.asarray(e1), np.asarray(e2), use_native=False
    )
    bvh = FlatBVH(
        lo=jnp.asarray(nodes["lo"]), hi=jnp.asarray(nodes["hi"]),
        first=jnp.asarray(nodes["first"]), count=jnp.asarray(nodes["count"]),
        skip=jnp.asarray(nodes["skip"]),
    )
    scene = dc.replace(scene, bvh=bvh)
    monkeypatch.setattr(intersect, "DENSE_ALGO", "woop-fused")
    assert not intersect.uses_woop_kernel(scene)
    assert not intersect.dispatch_returns_uv(scene)
    # and closest_hit actually runs (BVH walk) without touching Pallas
    o = jnp.zeros((8, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (8, 1))
    hit = intersect.closest_hit(scene, o, d)
    assert hit.u is None
