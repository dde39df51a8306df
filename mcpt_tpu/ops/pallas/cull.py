"""Pallas TPU kernel: fused block cull + per-ray top-K candidate keys.

This is the candidate-list builder of the block-wave traversal
(ops/blocks.py). The XLA reference path materializes the full [R, L] key
matrix in HBM (slab test), reloads it for the `> last_key` continuation mask,
and reloads it again inside `lax.top_k` — three HBM round-trips over
R*L*4 bytes per refill. Here one kernel computes the slab test, the key
encoding, the continuation mask, and an iterative K-way min extraction
entirely in VMEM, so HBM traffic is just the inputs ([L,3] boxes, [R,8]
rays) and the [R, K] output.

Semantics are bit-identical to ops/blocks._entry_keys + _top_k_keys:
  * reference AABB::Intersection slab test with the 1.001 far-slab fudge
    (reference: src/AABB.cpp:25-36), interval seeded from (t_lo, t_hi)
  * key = float_bits(max(near, 0)) with the low `bits` mantissa bits
    replaced by the block id; miss or key <= last_key -> INT32_MAX
  * output row = the K smallest keys, ascending (keys are unique per ray)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KEY_MISS = np.int32(2**31 - 1)

# Rays per grid step. 256 rows x L-lane VPU tiles keep the whole [RT, L]
# key matrix (L <= ~8k) comfortably inside VMEM.
RAY_TILE = 256


def _cull_kernel(
    box_ref, ray_ref, lastkey_ref, out_ref, *, K: int, bits: int, L: int,
    L_real: int,
):
    """One ray tile against all L (lane-padded) blocks; ids >= L_real masked.

    box_ref:  f32[8, L]   rows: lo_x lo_y lo_z hi_x hi_y hi_z (2 pad rows)
    ray_ref:  f32[RT, 8]  cols: org_xyz inv_d_xyz t_lo t_hi
    lastkey_ref: i32[RT, 1]
    out_ref:  i32[RT, OUT_COLS] (K live columns, rest KEY_MISS)
    """
    rays = ray_ref[:]  # [RT, 8]
    RT = rays.shape[0]

    near = jnp.full((RT, L), -jnp.inf, jnp.float32)
    far = jnp.full((RT, L), jnp.inf, jnp.float32)
    # static unroll over the 3 axes: ta/tb are [RT, L] broadcasts of a
    # [RT, 1] ray column against a [1, L] box row (both VPU-native)
    for a in range(3):
        o_a = rays[:, a][:, None]
        inv_a = rays[:, 3 + a][:, None]
        lo_a = box_ref[a, :][None, :]
        hi_a = box_ref[3 + a, :][None, :]
        ta = (lo_a - o_a) * inv_a
        tb = (hi_a - o_a) * inv_a
        near = jnp.maximum(near, jnp.minimum(ta, tb))
        # per-slab 1.001 far fudge (reference src/AABB.cpp:25-36)
        far = jnp.minimum(far, jnp.maximum(ta, tb) * 1.001)

    t_lo = rays[:, 6][:, None]
    t_hi = rays[:, 7][:, None]
    hit = jnp.maximum(t_lo, near) < jnp.minimum(t_hi, far)

    entry = jnp.maximum(near, 0.0)
    fb = jax.lax.bitcast_convert_type(entry, jnp.int32)
    ids = jax.lax.broadcasted_iota(jnp.int32, (RT, L), 1)
    key = ((fb >> bits) << bits) | ids
    # pad lanes masked by id: an inverted/NaN pad box does NOT fail the slab
    # test (each degenerate slab interval is (-inf, inf)), so geometry-based
    # padding alone would fabricate hits
    key = jnp.where(
        hit & (ids < L_real) & (key > lastkey_ref[:]), key, KEY_MISS
    )

    # iterative K-way min extraction (keys unique per ray except KEY_MISS).
    # Column writes via one-hot select — scatter doesn't lower on TPU.
    out_cols = out_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (RT, out_cols), 1)
    out = jnp.full((RT, out_cols), KEY_MISS, jnp.int32)
    for k in range(K):
        m = jnp.min(key, axis=1)  # [RT]
        out = jnp.where(col == k, m[:, None], out)
        key = jnp.where(key == m[:, None], KEY_MISS, key)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("K", "bits", "interpret"))
def top_k_candidates(
    lo, hi, org, inv_d, t_lo, t_hi, last_key, K: int, bits: int,
    interpret: bool = False,
):
    """[R, K] ascending candidate keys (> last_key), KEY_MISS-padded.

    Drop-in replacement for the XLA path in ops/blocks (see module doc).
    """
    R = org.shape[0]
    L = lo.shape[0]
    Lp = max(128, -(-L // 128) * 128)
    # pad boxes are zeros; the kernel masks ids >= L explicitly
    boxes = jnp.zeros((8, Lp), jnp.float32)
    boxes = boxes.at[0:3, :L].set(lo.T)
    boxes = boxes.at[3:6, :L].set(hi.T)

    t_lo = jnp.broadcast_to(jnp.asarray(t_lo, jnp.float32), (R,))
    t_hi = jnp.broadcast_to(jnp.asarray(t_hi, jnp.float32), (R,))
    rays = jnp.concatenate(
        [org, inv_d, t_lo[:, None], t_hi[:, None]], axis=1
    ).astype(jnp.float32)

    RT = min(RAY_TILE, R)
    Rp = -(-R // RT) * RT
    if Rp != R:
        rays = jnp.pad(rays, ((0, Rp - R), (0, 0)))
        last_key = jnp.pad(last_key, (0, Rp - R))
    out_cols = max(128, -(-K // 128) * 128)

    out = pl.pallas_call(
        functools.partial(_cull_kernel, K=K, bits=bits, L=Lp, L_real=L),
        out_shape=jax.ShapeDtypeStruct((Rp, out_cols), jnp.int32),
        grid=(Rp // RT,),
        in_specs=[
            pl.BlockSpec((8, Lp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (RT, out_cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(boxes, rays, last_key[:, None])
    return out[:R, :K]
