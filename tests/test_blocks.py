"""Block-wave traversal (ops/blocks): equivalence with the dense reference.

The contract (ops/blocks module docstring): closest_hit_blocks returns the
same hit as the dense Woop path (same accept predicate, lowest-tri-id tie
break) and any_hit_blocks matches any_hit's inclusive-interval predicate —
for every group size, candidate-list length, and across key-continuation
refills (small K forces them).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from mcpt_tpu.ops.blocks import (
    BlockSet,
    any_hit_blocks,
    build_blocks,
    closest_hit_blocks,
)
from mcpt_tpu.ops.intersect import (
    any_hit_woop,
    closest_hit_bruteforce,
    closest_hit_woop,
)


@dataclasses.dataclass
class _FakeScene:
    blocks: BlockSet


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
    """Minimal stand-in with just .geom for the dense intersectors."""
    from mcpt_tpu.scene import Geometry, Scene, Materials, TextureAtlas, Camera

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
        geom=g,
        mats=Materials(
            kd=jnp.zeros((1, 3)), ks=jnp.zeros((1, 3)), ns=jnp.ones((1,)),
            radiance=jnp.zeros((1, 3)), tex_id=-jnp.ones((1,), jnp.int32),
            tr=jnp.zeros((1, 3)), ni=jnp.ones((1,)),
        ),
        atlas=TextureAtlas(
            data=jnp.zeros((1, 1, 1, 3)), size=jnp.ones((1, 2), jnp.int32)
        ),
        light_tris=jnp.zeros((0,), jnp.int32),
        camera=Camera(
            eye=jnp.zeros(3), lookat=jnp.zeros(3), up=jnp.zeros(3),
            fovy=jnp.asarray(40.0),
        ),
    )


def _check_closest_match(scene, bsc, o, d, **kw):
    hd = closest_hit_woop(scene, o, d)
    hb = closest_hit_blocks(bsc, o, d, **kw)
    tri_d, tri_b = np.asarray(hd.tri), np.asarray(hb.tri)
    # identical hit triangle except possible sub-ulp f32 reduction-order ties
    assert (tri_d == tri_b).mean() > 0.995, (
        f"tri mismatch {np.flatnonzero(tri_d != tri_b)[:10]}"
    )
    same = tri_d == tri_b
    hit = tri_d >= 0
    # rtol covers f32 rounding: block Woop tables are built in host numpy,
    # the dense path's on device; the products differ by a few ulps
    np.testing.assert_allclose(
        np.asarray(hd.t)[same & hit], np.asarray(hb.t)[same & hit], rtol=1e-4
    )


@pytest.mark.parametrize("G,K,block_c", [(64, 16, 64), (16, 4, 32), (128, 8, 128)])
def test_blocks_closest_matches_dense(rng, G, K, block_c):
    v0, e1, e2 = _rand_soup(rng, 700)
    scene = _dense_scene(v0, e1, e2)
    bs = build_blocks(v0, e1, e2, block_c=block_c)
    bsc = dataclasses.replace(scene, blocks=bs)
    o, d = _rand_rays(rng, 512)
    _check_closest_match(scene, bsc, o, d, G=G, K=K, use_topk_pallas=False)


def test_blocks_small_k_forces_refill(rng):
    """K=2 on a 700-tri scene: rays overflow the candidate list repeatedly;
    key continuation must still visit every needed block (no missed hits)."""
    v0, e1, e2 = _rand_soup(rng, 700)
    scene = _dense_scene(v0, e1, e2)
    bs = build_blocks(v0, e1, e2, block_c=32)  # 22 blocks >> K
    bsc = dataclasses.replace(scene, blocks=bs)
    o, d = _rand_rays(rng, 256)
    _check_closest_match(scene, bsc, o, d, G=8, K=2, use_topk_pallas=False)


def test_blocks_ray_padding(rng):
    """Ray counts not divisible by G get padded lanes; outputs slice clean."""
    v0, e1, e2 = _rand_soup(rng, 300)
    scene = _dense_scene(v0, e1, e2)
    bs = build_blocks(v0, e1, e2, block_c=64)
    bsc = dataclasses.replace(scene, blocks=bs)
    o, d = _rand_rays(rng, 173)  # prime, not a multiple of anything
    _check_closest_match(scene, bsc, o, d, G=64, K=8, use_topk_pallas=False)


def test_blocks_any_hit_matches_dense(rng):
    v0, e1, e2 = _rand_soup(rng, 700)
    scene = _dense_scene(v0, e1, e2)
    bs = build_blocks(v0, e1, e2, block_c=64)
    bsc = dataclasses.replace(scene, blocks=bs)
    o, d = _rand_rays(rng, 512)
    for t_max in (2.0, 8.0, np.float32(np.finfo(np.float32).max)):
        ad = any_hit_woop(scene, o, d, t_max=t_max)
        ab = any_hit_blocks(bsc, o, d, t_max=t_max, G=32, K=4, use_topk_pallas=False)
        assert (np.asarray(ad) == np.asarray(ab)).all()


def test_blocks_t_interval(rng):
    """t_min/t_max windows restrict accepts identically to the dense path."""
    v0, e1, e2 = _rand_soup(rng, 400)
    scene = _dense_scene(v0, e1, e2)
    bs = build_blocks(v0, e1, e2, block_c=64)
    bsc = dataclasses.replace(scene, blocks=bs)
    o, d = _rand_rays(rng, 256)
    hd = closest_hit_woop(scene, o, d, t_min=1.0, t_max=6.0)
    hb = closest_hit_blocks(bsc, o, d, t_min=1.0, t_max=6.0, G=32, K=8,
                            use_topk_pallas=False)
    assert (np.asarray(hd.tri) == np.asarray(hb.tri)).mean() > 0.995


def test_blocks_via_scene_dispatch(rng):
    """attach_bvh(with_blocks=True) + closest_hit dispatch end to end."""
    from mcpt_tpu.ops.bvh import attach_bvh
    from mcpt_tpu.ops import intersect

    v0, e1, e2 = _rand_soup(rng, 900)
    scene = _dense_scene(v0, e1, e2)
    scened = attach_bvh(scene, with_blocks=True)
    assert scened.blocks is not None
    # dispatch threshold is static; call the blocks path directly plus the
    # auto dispatch with a forced low threshold
    o, d = _rand_rays(rng, 256)
    hb = closest_hit_blocks(scened, o, d)
    # brute force over the SAME (BVH-permuted) triangle buffer
    hd = closest_hit_bruteforce(scened, o, d)
    assert (np.asarray(hb.tri) == np.asarray(hd.tri)).mean() > 0.995

    old = intersect.BRUTE_FORCE_MAX_TRIS
    try:
        intersect.BRUTE_FORCE_MAX_TRIS = 100
        hv = intersect.closest_hit(scened, o, d)
    finally:
        intersect.BRUTE_FORCE_MAX_TRIS = old
    assert (np.asarray(hv.tri) == np.asarray(hb.tri)).all()


def test_blocks_degenerate_and_padding_tris(rng):
    """Zero-area triangles and block padding can never produce hits."""
    v0, e1, e2 = _rand_soup(rng, 100)
    e2[::7] = e1[::7]  # degenerate: |n| = 0
    scene = _dense_scene(v0, e1, e2)
    bs = build_blocks(v0, e1, e2, block_c=64)  # pads 100 -> 128
    bsc = dataclasses.replace(scene, blocks=bs)
    o, d = _rand_rays(rng, 128)
    hb = closest_hit_blocks(bsc, o, d, G=32, K=8, use_topk_pallas=False)
    tri = np.asarray(hb.tri)
    assert (tri < 100).all()
    assert not np.isin(tri, np.arange(0, 100, 7)).any()
