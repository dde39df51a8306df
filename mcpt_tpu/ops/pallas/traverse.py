"""Pallas TPU traversal megakernel over the two-level treelet layout.

Replaces the reference's recursive per-ray BVH walk (src/BVH.cpp:90-136) with
the scheme a single-vector-core machine wants (see ops/treelets.py for the
data layout):

  per tile of Rt rays, entirely in VMEM:
    1. superblock entry keys [Rt, NSp] — one dense slab pass, packed as
       int32 (float bits of entry_t, low bits = superblock id; ascending ==
       front-to-back; reference AABB::Intersection semantics incl. the 1.001
       far fudge, src/AABB.cpp:25-36)
    2. outer loop: vote = min key with entry < best_t over the whole tile
       -> superblock s; compute its treelet keys [Rt, S_B] from the
       VMEM-resident blk_box[s]
    3. inner loop: vote treelet b; ONE async DMA fetches its [10, C]
       triangle row HBM->VMEM; Moller-Trumbore intersects all Rt rays
       against all C triangles as a dense VPU wave; best (t, id) updates
       with the dense path's lowest-tri-id tie-break
    4. consumed columns are masked; per-ray pruning is implicit
       (entry_t >= best_t rays stop voting)

Correctness contract: same accept predicate as ops/intersect's dense path
(closest: |det| >= 1e-5, t in [t_min, t_max), u >= 0, v >= 0, 1-u-v >= 0,
src/Triangle.cpp:48-80; any: |det| >= 1e-6, inclusive interval,
src/Triangle.cpp:83-106), lowest-triangle-id tie break, so the returned hit
equals the brute-force reference up to f32 rounding. Every (ray, treelet)
pair whose entry_t lower bound is below the ray's final best_t is processed
(key entries are conservative lower bounds; quantizing the low mantissa bits
for the id pack only rounds the bound DOWN).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcpt_tpu.ops.treelets import TreeletSet

KEY_MISS = np.int32(2**31 - 1)
F32_MAX = np.float32(np.finfo(np.float32).max)
ID_MISS = np.int32(2**30)

DEFAULT_RAY_TILE = 1024


def _entry_keys(box_ref, o, inv, t_lo, t_hi, bits):
    """Packed int32 entry keys [Rt, L] for one AABB table [8, L].

    box rows: lo.xyz hi.xyz valid pad. Slab test = reference
    AABB::Intersection (1.001 far fudge per slab, strict tmin < tmax).
    Key = float_bits(max(near, 0)) with low `bits` bits = column id
    (entry >= 0 so the bitcast is monotone; clearing low mantissa bits
    rounds the entry lower bound down — conservative).
    """
    L = box_ref.shape[1]
    Rt = o.shape[0]
    near = jnp.full((Rt, L), -jnp.inf, jnp.float32)
    far = jnp.full((Rt, L), jnp.inf, jnp.float32)
    for a in range(3):
        o_a = o[:, a][:, None]
        inv_a = inv[:, a][:, None]
        ta = (box_ref[a, :][None, :] - o_a) * inv_a
        tb = (box_ref[3 + a, :][None, :] - o_a) * inv_a
        near = jnp.maximum(near, jnp.minimum(ta, tb))
        far = jnp.minimum(far, jnp.maximum(ta, tb) * 1.001)
    valid = box_ref[6, :][None, :] > 0.0
    hit = valid & (jnp.maximum(t_lo, near) < jnp.minimum(t_hi, far))
    entry = jnp.maximum(near, 0.0)
    fb = jax.lax.bitcast_convert_type(entry, jnp.int32)
    ids = jax.lax.broadcasted_iota(jnp.int32, (Rt, L), 1)
    key = ((fb >> bits) << bits) | ids
    return jnp.where(hit, key, KEY_MISS)


def _entry_lb(keys, bits):
    """Conservative f32 entry lower bound from packed keys (MISS -> NaN,
    which compares False against anything — exactly 'not live')."""
    return jax.lax.bitcast_convert_type((keys >> bits) << bits, jnp.float32)


def _mt_wave(tribuf, o, d, t_lo, det_eps):
    """Moller-Trumbore [Rt, C]: rays (cols of o/d [Rt,3]) x treelet rows.

    Returns (t, u, v, ok, tri_id). Same math as ops/intersect._mt_candidates
    (reference src/Triangle.cpp:48-80), broadcast [Rt,1] x [1,C] on the VPU.
    """
    v0x = tribuf[0, :][None, :]
    v0y = tribuf[1, :][None, :]
    v0z = tribuf[2, :][None, :]
    e1x = tribuf[3, :][None, :]
    e1y = tribuf[4, :][None, :]
    e1z = tribuf[5, :][None, :]
    e2x = tribuf[6, :][None, :]
    e2y = tribuf[7, :][None, :]
    e2z = tribuf[8, :][None, :]
    tri_id = jax.lax.bitcast_convert_type(tribuf[9, :], jnp.int32)[None, :]

    ox, oy, oz = o[:, 0][:, None], o[:, 1][:, None], o[:, 2][:, None]
    dx, dy, dz = d[:, 0][:, None], d[:, 1][:, None], d[:, 2][:, None]

    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    det = e1x * hx + e1y * hy + e1z * hz
    ok = jnp.abs(det) >= det_eps
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    u = (sx * hx + sy * hy + sz * hz) * inv_det
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    return t, u, v, ok, tri_id


def _closest_kernel(
    sb_box, blk_box, ray_ref, tri_hbm, out_t, out_id,
    tribuf, sem, *, bits_ns, bits_sb, s_b,
):
    rays = ray_ref[:]
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    inv = rays[:, 6:9]
    t_lo = rays[:, 9][:, None]
    t_hi = rays[:, 10][:, None]
    Rt = rays.shape[0]

    # Key matrices ride the while_loop CARRIES (values, not scratch refs):
    # loop conds must be pure functions of the carry — a cond that reads a
    # ref the body mutates is undefined under state discharge (and hangs the
    # interpreter). Only the DMA landing buffer stays a scratch ref.
    sbkeys0 = _entry_keys(sb_box, o, inv, t_lo, t_hi, bits_ns)

    def outer_cond(st):
        sbkeys, best_t, best_id = st
        return jnp.any(_entry_lb(sbkeys, bits_ns) < best_t)

    def outer_body(st):
        sbkeys, best_t, best_id = st
        live = _entry_lb(sbkeys, bits_ns) < best_t
        m = jnp.min(jnp.where(live, sbkeys, KEY_MISS))
        s = m & ((1 << bits_ns) - 1)

        bk0 = _entry_keys(
            blk_box[s], o, inv, t_lo, jnp.minimum(t_hi, best_t), bits_sb
        )

        def inner_cond(st):
            bk, best_t, best_id = st
            return jnp.any(_entry_lb(bk, bits_sb) < best_t)

        def inner_body(st):
            bk, best_t, best_id = st
            live = _entry_lb(bk, bits_sb) < best_t
            mb = jnp.min(jnp.where(live, bk, KEY_MISS))
            b = mb & ((1 << bits_sb) - 1)

            dma = pltpu.make_async_copy(tri_hbm.at[s * s_b + b], tribuf, sem)
            dma.start()
            dma.wait()

            t, u, v, ok, tri_id = _mt_wave(tribuf, o, d, t_lo, 1e-5)
            accept = (
                ok & (t >= t_lo) & (t < t_hi) & (t <= best_t)
                & (u >= 0) & (v >= 0) & (1.0 - u - v >= 0)
            )
            t_cand = jnp.where(accept, t, F32_MAX)
            row_t = jnp.min(t_cand, axis=1)[:, None]
            row_id = jnp.min(
                jnp.where(t_cand <= row_t, tri_id, ID_MISS), axis=1
            )[:, None]
            # lowest-tri-id tie break (ops/intersect._min_and_first_index).
            # row_t == F32_MAX is the no-accept sentinel and must never tie
            # against best_t's init value (t_hi can be F32_MAX).
            better = (row_t < best_t) | ((row_t == best_t) & (row_id < best_id))
            better = better & (row_t < F32_MAX)
            best_t = jnp.where(better, row_t, best_t)
            best_id = jnp.where(better, row_id, best_id)

            lane = jax.lax.broadcasted_iota(jnp.int32, bk.shape, 1)
            bk = jnp.where(lane == b, KEY_MISS, bk)
            return bk, best_t, best_id

        _, best_t, best_id = jax.lax.while_loop(
            inner_cond, inner_body, (bk0, best_t, best_id)
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, sbkeys.shape, 1)
        sbkeys = jnp.where(lane == s, KEY_MISS, sbkeys)
        return sbkeys, best_t, best_id

    best_t = t_hi
    best_id = jnp.full((Rt, 1), ID_MISS, jnp.int32)
    _, best_t, best_id = jax.lax.while_loop(
        outer_cond, outer_body, (sbkeys0, best_t, best_id)
    )
    hit = best_id < ID_MISS
    out_t[:] = jnp.where(hit, best_t, F32_MAX)
    out_id[:] = jnp.where(hit, best_id, -1)


def _any_kernel(
    sb_box, blk_box, ray_ref, tri_hbm, out_hit,
    tribuf, sem, *, bits_ns, bits_sb, s_b,
):
    rays = ray_ref[:]
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    inv = rays[:, 6:9]
    t_lo = rays[:, 9][:, None]
    t_hi = rays[:, 10][:, None]
    Rt = rays.shape[0]

    sbkeys0 = _entry_keys(sb_box, o, inv, t_lo, t_hi, bits_ns)

    def live_keys(keys, found):
        # occlusion needs no front-to-back pruning: any unvisited key counts
        return (~found) & (keys != KEY_MISS)

    def outer_cond(st):
        sbkeys, found = st
        return jnp.any(live_keys(sbkeys, found))

    def outer_body(st):
        sbkeys, found = st
        live = live_keys(sbkeys, found)
        m = jnp.min(jnp.where(live, sbkeys, KEY_MISS))
        s = m & ((1 << bits_ns) - 1)

        bk0 = _entry_keys(blk_box[s], o, inv, t_lo, t_hi, bits_sb)

        def inner_cond(st):
            bk, found = st
            return jnp.any(live_keys(bk, found))

        def inner_body(st):
            bk, found = st
            live = live_keys(bk, found)
            mb = jnp.min(jnp.where(live, bk, KEY_MISS))
            b = mb & ((1 << bits_sb) - 1)

            dma = pltpu.make_async_copy(tri_hbm.at[s * s_b + b], tribuf, sem)
            dma.start()
            dma.wait()

            # any-hit predicate: inclusive interval, 1e-6 det eps
            # (reference Triangle::isIntersect, src/Triangle.cpp:83-106)
            t, u, v, ok, _ = _mt_wave(tribuf, o, d, t_lo, 1e-6)
            accept = (
                ok & (t >= t_lo) & (t <= t_hi)
                & (u >= 0) & (u <= 1.0) & (v >= 0) & (u + v <= 1.0)
            )
            found = found | jnp.any(accept, axis=1)[:, None]

            lane = jax.lax.broadcasted_iota(jnp.int32, bk.shape, 1)
            bk = jnp.where(lane == b, KEY_MISS, bk)
            return bk, found

        _, found = jax.lax.while_loop(inner_cond, inner_body, (bk0, found))
        lane = jax.lax.broadcasted_iota(jnp.int32, sbkeys.shape, 1)
        sbkeys = jnp.where(lane == s, KEY_MISS, sbkeys)
        return sbkeys, found

    found = jnp.zeros((Rt, 1), bool)
    _, found = jax.lax.while_loop(outer_cond, outer_body, (sbkeys0, found))
    out_hit[:] = found.astype(jnp.int32)


def _pack_rays(org, dirn, t_min, t_max, Rt):
    R = org.shape[0]
    t_lo = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_hi = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    inv = 1.0 / dirn
    rays = jnp.concatenate(
        [
            org.astype(jnp.float32),
            dirn.astype(jnp.float32),
            inv.astype(jnp.float32),
            t_lo[:, None],
            t_hi[:, None],
            jnp.zeros((R, 5), jnp.float32),
        ],
        axis=1,
    )  # [R, 16]
    Rp = -(-R // Rt) * Rt
    if Rp != R:
        pad = jnp.zeros((Rp - R, 16), jnp.float32)
        pad = pad.at[:, 3:9].set(1.0)  # benign direction, t_hi = 0 => no keys
        rays = jnp.concatenate([rays, pad], axis=0)
    return rays, R, Rp


def _bits(n: int) -> int:
    return max(1, int(np.ceil(np.log2(max(n, 2)))))


@functools.partial(
    jax.jit, static_argnames=("ray_tile", "interpret")
)
def closest_hit_treelets_impl(
    ts: TreeletSet, org, dirn, t_min, t_max,
    ray_tile: int = DEFAULT_RAY_TILE, interpret: bool = False,
):
    nsp = ts.sb_box.shape[1]
    ns, _, s_b = ts.blk_box.shape
    c = ts.c
    bits_ns = _bits(nsp)
    bits_sb = _bits(s_b)
    rays, R, Rp = _pack_rays(org, dirn, t_min, t_max, ray_tile)
    Rt = min(ray_tile, Rp)

    out_t, out_id = pl.pallas_call(
        functools.partial(
            _closest_kernel, bits_ns=bits_ns, bits_sb=bits_sb, s_b=s_b
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 1), jnp.int32),
        ),
        grid=(Rp // Rt,),
        in_specs=[
            pl.BlockSpec((8, nsp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ns, 8, s_b), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((Rt, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((Rt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Rt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((10, c), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(ts.sb_box, ts.blk_box, rays, ts.tri)
    return out_t[:R, 0], out_id[:R, 0]


@functools.partial(
    jax.jit, static_argnames=("ray_tile", "interpret")
)
def any_hit_treelets_impl(
    ts: TreeletSet, org, dirn, t_min, t_max,
    ray_tile: int = DEFAULT_RAY_TILE, interpret: bool = False,
):
    nsp = ts.sb_box.shape[1]
    ns, _, s_b = ts.blk_box.shape
    c = ts.c
    bits_ns = _bits(nsp)
    bits_sb = _bits(s_b)
    rays, R, Rp = _pack_rays(org, dirn, t_min, t_max, ray_tile)
    Rt = min(ray_tile, Rp)

    out = pl.pallas_call(
        functools.partial(
            _any_kernel, bits_ns=bits_ns, bits_sb=bits_sb, s_b=s_b
        ),
        out_shape=jax.ShapeDtypeStruct((Rp, 1), jnp.int32),
        grid=(Rp // Rt,),
        in_specs=[
            pl.BlockSpec((8, nsp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ns, 8, s_b), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((Rt, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (Rt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((10, c), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(ts.sb_box, ts.blk_box, rays, ts.tri)
    return out[:R, 0] > 0


def _default_interpret() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return True


def closest_hit_treelets(
    scene, org, dirn, t_min=1e-4, t_max=F32_MAX,
    ray_tile: int = DEFAULT_RAY_TILE, interpret: bool = None,
):
    """Hit record (ops/intersect.Hit) via the Pallas megakernel."""
    from mcpt_tpu.ops.intersect import Hit

    if interpret is None:
        interpret = _default_interpret()
    t, tri = closest_hit_treelets_impl(
        scene.treelets, org, dirn, t_min, t_max,
        ray_tile=ray_tile, interpret=interpret,
    )
    return Hit(t=t, tri=tri)


def any_hit_treelets(
    scene, org, dirn, t_min=1e-4, t_max=F32_MAX,
    ray_tile: int = DEFAULT_RAY_TILE, interpret: bool = None,
):
    if interpret is None:
        interpret = _default_interpret()
    return any_hit_treelets_impl(
        scene.treelets, org, dirn, t_min, t_max,
        ray_tile=ray_tile, interpret=interpret,
    )
