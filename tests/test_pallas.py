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
