"""Pallas cull kernel == XLA candidate-key path, bit for bit.

Runs the kernel in interpreter mode on the CPU mesh (the compiled kernel is
exercised on real TPUs by the traversal benchmarks and the default dispatch
in ops/blocks._default_use_pallas)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mcpt_tpu.ops.blocks import (
    KEY_MISS,
    _entry_keys,
    _id_bits,
    _top_k_keys,
    build_blocks,
)
from mcpt_tpu.ops.pallas.cull import top_k_candidates


def _soup_and_rays(rng, T=500, R=192):
    base = rng.uniform(-5, 5, (T, 3))
    e1 = rng.normal(size=(T, 3)) * 0.8
    e2 = rng.normal(size=(T, 3)) * 0.8
    o = jnp.asarray(rng.uniform(-6, 6, (R, 3)), jnp.float32)
    d = rng.normal(size=(R, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return build_blocks(base, e1, e2, block_c=32), o, jnp.asarray(d, jnp.float32)


@pytest.mark.parametrize("K", [4, 16])
def test_cull_kernel_matches_xla(rng, K):
    bs, org, dirn = _soup_and_rays(rng)
    R = org.shape[0]
    inv_d = 1.0 / dirn
    bits = _id_bits(bs.n_blocks)
    t_lo = jnp.full((R,), 1e-4, jnp.float32)
    t_hi = jnp.full((R,), np.float32(np.finfo(np.float32).max))
    last_key = jnp.full((R,), -(2**31), jnp.int32)

    ref_keys = _entry_keys(bs, org, inv_d, t_lo, t_hi)
    ref_keys = jnp.where(ref_keys > last_key[:, None], ref_keys, KEY_MISS)
    ref = _top_k_keys(ref_keys, K)

    out = top_k_candidates(
        bs.lo, bs.hi, org, inv_d, t_lo, t_hi, last_key, K, bits, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_cull_kernel_continuation(rng):
    """last_key continuation: the kernel returns only keys strictly greater,
    so chaining two K-sized requests covers the first 2K keys exactly."""
    bs, org, dirn = _soup_and_rays(rng, T=800, R=64)
    R = org.shape[0]
    inv_d = 1.0 / dirn
    bits = _id_bits(bs.n_blocks)
    t_lo = jnp.full((R,), 1e-4, jnp.float32)
    t_hi = jnp.full((R,), np.float32(np.finfo(np.float32).max))
    K = 4

    first = top_k_candidates(
        bs.lo, bs.hi, org, inv_d, t_lo, t_hi,
        jnp.full((R,), -(2**31), jnp.int32), K, bits, interpret=True,
    )
    second = top_k_candidates(
        bs.lo, bs.hi, org, inv_d, t_lo, t_hi, first[:, K - 1], K, bits,
        interpret=True,
    )

    ref_keys = _entry_keys(bs, org, inv_d, t_lo, t_hi)
    ref8 = _top_k_keys(ref_keys, 2 * K)
    both = jnp.concatenate([first, second], axis=1)
    # rows whose first window ended in KEY_MISS have no continuation contract
    full_rows = np.asarray(first[:, K - 1]) != KEY_MISS
    np.testing.assert_array_equal(
        np.asarray(both)[full_rows], np.asarray(ref8)[full_rows]
    )
    # exhausted rows: second window must be all KEY_MISS
    assert (np.asarray(second)[~full_rows] == KEY_MISS).all()


def test_cull_kernel_ray_padding(rng):
    """R not a multiple of the ray tile pads and slices cleanly."""
    bs, org, dirn = _soup_and_rays(rng, T=300, R=77)
    R = org.shape[0]
    inv_d = 1.0 / dirn
    bits = _id_bits(bs.n_blocks)
    t_lo = jnp.full((R,), 1e-4, jnp.float32)
    t_hi = jnp.full((R,), np.float32(np.finfo(np.float32).max))
    last_key = jnp.full((R,), -(2**31), jnp.int32)

    ref_keys = _entry_keys(bs, org, inv_d, t_lo, t_hi)
    ref = _top_k_keys(
        jnp.where(ref_keys > last_key[:, None], ref_keys, KEY_MISS), 8
    )
    out = top_k_candidates(
        bs.lo, bs.hi, org, inv_d, t_lo, t_hi, last_key, 8, bits, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_dense_kernel_interpret_matches_bruteforce():
    """ops/pallas/dense in interpret mode vs the XLA brute force."""
    import numpy as np

    import jax.numpy as jnp

    from mcpt_tpu.ops.intersect import closest_hit_bruteforce
    from mcpt_tpu.ops.pallas.dense import closest_hit_dense
    from mcpt_tpu.scene import Geometry, Scene

    T, R = 700, 96
    rng = np.random.default_rng(3)
    v0 = rng.uniform(-4, 4, (T, 3)).astype(np.float32)
    e1 = (rng.normal(size=(T, 3)) * 0.5).astype(np.float32)
    e2 = (rng.normal(size=(T, 3)) * 0.5).astype(np.float32)
    g = Geometry(
        v0=jnp.asarray(v0), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
        vn=jnp.zeros((T, 3, 3), jnp.float32),
        uv=jnp.zeros((T, 3, 2), jnp.float32),
        mat_id=jnp.zeros((T,), jnp.int32), area=jnp.ones((T,), jnp.float32),
    )
    scene = Scene(geom=g, mats=None, atlas=None, light_tris=None, camera=None)
    o = jnp.asarray(rng.uniform(-5, 5, (R, 3)), np.float32)
    d = rng.normal(size=(R, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), np.float32)
    ref = closest_hit_bruteforce(scene, o, d)
    got = closest_hit_dense(scene, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
