"""Pallas dense intersection: small scenes, whole triangle table in VMEM.

The XLA dense path (ops/intersect closest_hit_woop / _bruteforce) is
HBM-bound on TPU: XLA materializes the per-(ray, triangle) intermediates
(the Woop projection alone is R x 6T f32 — ~400 MB per bounce at a 32k-ray
wavefront on veach-mis), so a compute-trivial workload moves gigabytes per
iteration. This kernel keeps everything in VMEM: the triangle table
([16, C] rows, same layout as ops/treelets) is a VMEM input, each grid
step intersects one ray tile against all triangle chunks with the same
Moller-Trumbore wave the treelet kernel uses, and nothing but rays and the
final (t, id) ever touches HBM. Measured on veach-mis (972 tris):
~7x the XLA dense path per traversal call.

Dispatch: ops/intersect routes scenes with <= BRUTE_FORCE_MAX_TRIS
triangles here on real TPUs; CPU meshes keep the XLA path (interpret-mode
Pallas would be slower than XLA's native fusion).

Reference predicate parity: closest-hit |det| >= 1e-5, t in [t_min, t_max)
(src/Triangle.cpp:48-80); any-hit |det| >= 1e-6, inclusive interval
(src/Triangle.cpp:83-106); lowest-triangle-id tie break.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcpt_tpu.ops.pallas.traverse import (
    F32_MAX,
    ID_MISS,
    _mt_wave,
    _pack_rays,
)

# Triangles per in-kernel chunk: bounds the [Rt, TC] wave temporaries so
# Mosaic's VMEM working set stays small (Rt=128 x 512 x ~15 live arrays
# ~= 4 MB).
TRI_CHUNK = 512
DENSE_RAY_TILE = 256  # 512 is ~5% faster per call but Mosaic compile jumps 44 s -> 340 s


def _dense_closest_kernel(tri_vmem, ray_ref, out_t, out_id):
    rays = ray_ref[:]
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    t_lo = rays[:, 9][:, None]
    t_hi = rays[:, 10][:, None]
    Rt = rays.shape[0]
    n_chunks = tri_vmem.shape[0]

    def body(c, st):
        best_t, best_id = st
        t, u, v, ok, tri_id = _mt_wave(tri_vmem.at[c], o, d, t_lo, 1e-5)
        accept = (
            ok & (t >= t_lo) & (t < t_hi) & (t <= best_t)
            & (u >= 0) & (v >= 0) & (1.0 - u - v >= 0)
        )
        t_cand = jnp.where(accept, t, F32_MAX)
        row_t = jnp.min(t_cand, axis=1)[:, None]
        row_id = jnp.min(
            jnp.where(t_cand <= row_t, tri_id, ID_MISS), axis=1
        )[:, None]
        better = (row_t < best_t) | ((row_t == best_t) & (row_id < best_id))
        better = better & (row_t < F32_MAX)
        return (
            jnp.where(better, row_t, best_t),
            jnp.where(better, row_id, best_id),
        )

    best_t, best_id = jax.lax.fori_loop(
        0, n_chunks, body, (t_hi, jnp.full((Rt, 1), ID_MISS, jnp.int32))
    )
    hit = best_id < ID_MISS
    W = out_t.shape[1]
    out_t[:] = jnp.broadcast_to(jnp.where(hit, best_t, F32_MAX), (Rt, W))
    out_id[:] = jnp.broadcast_to(jnp.where(hit, best_id, -1), (Rt, W))


def _dense_any_kernel(tri_vmem, ray_ref, out_hit):
    rays = ray_ref[:]
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    t_lo = rays[:, 9][:, None]
    t_hi = rays[:, 10][:, None]
    Rt = rays.shape[0]
    n_chunks = tri_vmem.shape[0]

    def body(c, found):
        t, u, v, ok, _ = _mt_wave(tri_vmem.at[c], o, d, t_lo, 1e-6)
        accept = (
            ok & (t >= t_lo) & (t <= t_hi)
            & (u >= 0) & (u <= 1.0) & (v >= 0) & (u + v <= 1.0)
        )
        return found | jnp.any(accept, axis=1)[:, None].astype(jnp.int32)

    found = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((Rt, 1), jnp.int32)
    )
    W = out_hit.shape[1]
    out_hit[:] = jnp.broadcast_to(found, (Rt, W))


def pack_dense_table(v0, e1, e2):
    """Geometry -> [n_chunks, 16, TRI_CHUNK] VMEM table (treelet row layout:
    v0.xyz e1.xyz e2.xyz id-bitcast + pad rows; pad lanes have det == 0)."""
    T = v0.shape[0]
    Tp = -(-T // TRI_CHUNK) * TRI_CHUNK
    rows = jnp.zeros((16, Tp), jnp.float32)
    rows = rows.at[0:3, :T].set(v0.T)
    rows = rows.at[3:6, :T].set(e1.T)
    rows = rows.at[6:9, :T].set(e2.T)
    ids = jnp.arange(Tp, dtype=jnp.int32)
    ids = jnp.where(ids < T, ids, jnp.int32(ID_MISS))
    rows = rows.at[9, :].set(jax.lax.bitcast_convert_type(ids, jnp.float32))
    return rows.reshape(16, Tp // TRI_CHUNK, TRI_CHUNK).transpose(1, 0, 2)


@functools.partial(jax.jit, static_argnames=("ray_tile", "interpret"))
def closest_hit_dense_impl(
    v0, e1, e2, org, dirn, t_min, t_max,
    ray_tile: int = DENSE_RAY_TILE, interpret: bool = False,
):
    table = pack_dense_table(v0, e1, e2)
    rays, R, Rp = _pack_rays(org, dirn, t_min, t_max, ray_tile)
    Rt = min(ray_tile, Rp)
    out_t, out_id = pl.pallas_call(
        _dense_closest_kernel,
        grid=(Rp // Rt,),
        out_shape=(
            jax.ShapeDtypeStruct((Rp, 128), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 128), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(
                table.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((Rt, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Rt, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Rt, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(table, rays)
    return out_t[:R, 0], out_id[:R, 0]


@functools.partial(jax.jit, static_argnames=("ray_tile", "interpret"))
def any_hit_dense_impl(
    v0, e1, e2, org, dirn, t_min, t_max,
    ray_tile: int = DENSE_RAY_TILE, interpret: bool = False,
):
    table = pack_dense_table(v0, e1, e2)
    rays, R, Rp = _pack_rays(org, dirn, t_min, t_max, ray_tile)
    Rt = min(ray_tile, Rp)
    out = pl.pallas_call(
        _dense_any_kernel,
        grid=(Rp // Rt,),
        out_shape=jax.ShapeDtypeStruct((Rp, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(
                table.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((Rt, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (Rt, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(table, rays)
    return out[:R, 0] > 0


def closest_hit_dense(scene, org, dirn, t_min=1e-4, t_max=F32_MAX, **kw):
    """Hit record via the dense VMEM kernel (small scenes, real TPUs)."""
    from mcpt_tpu.ops.intersect import Hit

    g = scene.geom
    t, tri = closest_hit_dense_impl(
        g.v0, g.e1, g.e2, org, dirn, t_min, t_max, **kw
    )
    return Hit(t=t, tri=tri)


def any_hit_dense(scene, org, dirn, t_min=1e-4, t_max=F32_MAX, **kw):
    g = scene.geom
    return any_hit_dense_impl(g.v0, g.e1, g.e2, org, dirn, t_min, t_max, **kw)
