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
       -> superblock s; DMA its treelet AABB table blk_box[s] and compute
       treelet keys [Rt, S_B]
    3. inner loop: vote treelet b; ONE async DMA fetches its [16, C]
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

# 256 measured fastest on v5e (bathroom-stress, 65k rays): larger tiles
# union more treelets per vote AND the kernel's [Rt, NSp] key temporaries
# exceed the 16 MB scoped-VMEM stack at 1024 (compile OOM).
DEFAULT_RAY_TILE = 256


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
    sb_box, blk_box_hbm, ray_ref, tri_hbm, out_t, out_id,
    sbk_ref, bk_ref, tribuf, bb_buf, sem, sem2, *, bits_ns, bits_sb, s_b,
):
    rays = ray_ref[:]
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    inv = rays[:, 6:9]
    t_lo = rays[:, 9][:, None]
    t_hi = rays[:, 10][:, None]
    Rt = rays.shape[0]

    # Loop discipline: key matrices live in SCRATCH REFS (sbk_ref/bk_ref);
    # every while_loop cond is a pure function of its carry — the body
    # computes the continue flag from the value it just wrote, so no cond
    # ever reads a mutated ref (undefined under state discharge) and no
    # multi-hundred-KB matrix rides a loop carry.
    #
    # DMA pipeline: treelet rows are DOUBLE-BUFFERED (tribuf [2,16,C], one
    # DMA semaphore per slot). Each inner iteration votes and launches the
    # NEXT treelet's copy before waiting on the current one, so the
    # HBM->VMEM latency hides under the Moller-Trumbore wave. The next vote
    # uses the pre-wave best_t (one treelet stale) — it can only fetch a
    # treelet the exact schedule would also have fetched, never skip one.
    sbkeys = _entry_keys(sb_box, o, inv, t_lo, t_hi, bits_ns)
    sbk_ref[:] = sbkeys
    cont0 = jnp.any(_entry_lb(sbkeys, bits_ns) < t_hi)

    def outer_cond(st):
        return st[0]

    def outer_body(st):
        _, best_t, best_id = st
        keys = sbk_ref[:]
        live = _entry_lb(keys, bits_ns) < best_t
        m = jnp.min(jnp.where(live, keys, KEY_MISS))
        s = m & ((1 << bits_ns) - 1)

        bdma = pltpu.make_async_copy(blk_box_hbm.at[s], bb_buf, sem2)
        bdma.start()
        bdma.wait()
        bk0 = _entry_keys(
            bb_buf, o, inv, t_lo, jnp.minimum(t_hi, best_t), bits_sb
        )
        icont0 = jnp.any(_entry_lb(bk0, bits_sb) < best_t)
        # prologue: vote + launch the first treelet into slot 0
        mb0 = jnp.min(jnp.where(_entry_lb(bk0, bits_sb) < best_t, bk0, KEY_MISS))
        b0 = mb0 & ((1 << bits_sb) - 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, bk0.shape, 1)
        bk_ref[:] = jnp.where(lane == b0, KEY_MISS, bk0)

        @pl.when(icont0)
        def _():
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + b0], tribuf.at[0], sem.at[0]
            ).start()

        def inner_cond(st):
            return st[0]

        def inner_body(st):
            _, slot, b, best_t, best_id = st
            # vote + prefetch the NEXT treelet into the other slot
            bk = bk_ref[:]
            nlive = _entry_lb(bk, bits_sb) < best_t
            has_next = jnp.any(nlive)
            mbn = jnp.min(jnp.where(nlive, bk, KEY_MISS))
            bn = mbn & ((1 << bits_sb) - 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, bk.shape, 1)
            bk_ref[:] = jnp.where(lane == bn, KEY_MISS, bk)

            @pl.when(has_next)
            def _():
                pltpu.make_async_copy(
                    tri_hbm.at[s * s_b + bn], tribuf.at[1 - slot], sem.at[1 - slot]
                ).start()

            # drain the current slot's copy, then intersect it
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + b], tribuf.at[slot], sem.at[slot]
            ).wait()
            t, u, v, ok, tri_id = _mt_wave(tribuf.at[slot], o, d, t_lo, 1e-5)
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
            return has_next, 1 - slot, bn, best_t, best_id

        _, _, _, best_t, best_id = jax.lax.while_loop(
            inner_cond, inner_body,
            (icont0, jnp.int32(0), b0, best_t, best_id),
        )
        # no DMA is in flight at loop exit: every prefetch is launched only
        # when has_next, and the following iteration always waits on it; the
        # final iteration (has_next = False) launches nothing.
        lane = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
        keys = jnp.where(lane == s, KEY_MISS, keys)
        sbk_ref[:] = keys
        cont = jnp.any(_entry_lb(keys, bits_ns) < best_t)
        return cont, best_t, best_id

    best_t = t_hi
    best_id = jnp.full((Rt, 1), ID_MISS, jnp.int32)
    _, best_t, best_id = jax.lax.while_loop(
        outer_cond, outer_body, (cont0, best_t, best_id)
    )
    hit = best_id < ID_MISS
    W = out_t.shape[1]
    out_t[:] = jnp.broadcast_to(jnp.where(hit, best_t, F32_MAX), (Rt, W))
    out_id[:] = jnp.broadcast_to(jnp.where(hit, best_id, -1), (Rt, W))


def _any_kernel(
    sb_box, blk_box_hbm, ray_ref, tri_hbm, out_hit,
    sbk_ref, bk_ref, tribuf, bb_buf, sem, sem2, *, bits_ns, bits_sb, s_b,
):
    rays = ray_ref[:]
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    inv = rays[:, 6:9]
    t_lo = rays[:, 9][:, None]
    t_hi = rays[:, 10][:, None]
    Rt = rays.shape[0]

    # `found` rides the while-loop carries as an i32 [Rt,1] vector (1 =
    # occluded): Mosaic cannot legalize vector<i1> scf.yield loop carries on
    # TPU ("failed to legalize scf.yield over vector<8x128xi1>"), so the
    # boolean state is kept in integer form and compared where needed.
    def live_keys(keys, found):
        # occlusion needs no front-to-back pruning: any unvisited key counts
        return (found == 0) & (keys != KEY_MISS)

    sbkeys = _entry_keys(sb_box, o, inv, t_lo, t_hi, bits_ns)
    sbk_ref[:] = sbkeys
    found0 = jnp.zeros((Rt, 1), jnp.int32)
    cont0 = jnp.any(live_keys(sbkeys, found0))

    def outer_cond(st):
        return st[0]

    def outer_body(st):
        _, found = st
        keys = sbk_ref[:]
        live = live_keys(keys, found)
        m = jnp.min(jnp.where(live, keys, KEY_MISS))
        s = m & ((1 << bits_ns) - 1)

        bdma = pltpu.make_async_copy(blk_box_hbm.at[s], bb_buf, sem2)
        bdma.start()
        bdma.wait()
        bk0 = _entry_keys(bb_buf, o, inv, t_lo, t_hi, bits_sb)
        icont0 = jnp.any(live_keys(bk0, found))
        # double-buffered treelet pipeline (see _closest_kernel)
        mb0 = jnp.min(jnp.where(live_keys(bk0, found), bk0, KEY_MISS))
        b0 = mb0 & ((1 << bits_sb) - 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, bk0.shape, 1)
        bk_ref[:] = jnp.where(lane == b0, KEY_MISS, bk0)

        @pl.when(icont0)
        def _():
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + b0], tribuf.at[0], sem.at[0]
            ).start()

        def inner_cond(st):
            return st[0]

        def inner_body(st):
            _, slot, b, found = st
            bk = bk_ref[:]
            nlive = live_keys(bk, found)
            has_next = jnp.any(nlive)
            mbn = jnp.min(jnp.where(nlive, bk, KEY_MISS))
            bn = mbn & ((1 << bits_sb) - 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, bk.shape, 1)
            bk_ref[:] = jnp.where(lane == bn, KEY_MISS, bk)

            @pl.when(has_next)
            def _():
                pltpu.make_async_copy(
                    tri_hbm.at[s * s_b + bn], tribuf.at[1 - slot], sem.at[1 - slot]
                ).start()

            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + b], tribuf.at[slot], sem.at[slot]
            ).wait()
            # any-hit predicate: inclusive interval, 1e-6 det eps
            # (reference Triangle::isIntersect, src/Triangle.cpp:83-106)
            t, u, v, ok, _ = _mt_wave(tribuf.at[slot], o, d, t_lo, 1e-6)
            accept = (
                ok & (t >= t_lo) & (t <= t_hi)
                & (u >= 0) & (u <= 1.0) & (v >= 0) & (u + v <= 1.0)
            )
            found = found | jnp.any(accept, axis=1)[:, None].astype(jnp.int32)
            return has_next, 1 - slot, bn, found

        _, _, _, found = jax.lax.while_loop(
            inner_cond, inner_body, (icont0, jnp.int32(0), b0, found)
        )
        keys = sbk_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
        keys = jnp.where(lane == s, KEY_MISS, keys)
        sbk_ref[:] = keys
        cont = jnp.any(live_keys(keys, found))
        return cont, found

    _, found = jax.lax.while_loop(outer_cond, outer_body, (cont0, found0))
    W = out_hit.shape[1]
    out_hit[:] = jnp.broadcast_to(found, (Rt, W))


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

    call = pl.pallas_call(
        functools.partial(
            _closest_kernel, bits_ns=bits_ns, bits_sb=bits_sb, s_b=s_b
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Rt, 128), jnp.float32),
            jax.ShapeDtypeStruct((Rt, 128), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((Rt, nsp), jnp.int32),
            pltpu.VMEM((Rt, s_b), jnp.int32),
            pltpu.VMEM((2, 16, c), jnp.float32),  # double-buffered treelet rows
            pltpu.VMEM((8, s_b), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),  # one per treelet slot
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )
    # One gridless call per ray tile, unrolled in the traced program: a
    # multi-step grid combined with in-kernel manual DMA wedges the TPU
    # runtime (tools/probe_grid.py v1), so tiling lives OUTSIDE the kernel.
    outs = [
        call(ts.sb_box, ts.blk_box, rays[i * Rt : (i + 1) * Rt], ts.tri)
        for i in range(Rp // Rt)
    ]
    out_t = jnp.concatenate([t[:, 0] for t, _ in outs], axis=0)
    out_id = jnp.concatenate([i[:, 0] for _, i in outs], axis=0)
    return out_t[:R], out_id[:R]


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

    call = pl.pallas_call(
        functools.partial(
            _any_kernel, bits_ns=bits_ns, bits_sb=bits_sb, s_b=s_b
        ),
        out_shape=jax.ShapeDtypeStruct((Rt, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Rt, nsp), jnp.int32),
            pltpu.VMEM((Rt, s_b), jnp.int32),
            pltpu.VMEM((2, 16, c), jnp.float32),  # double-buffered treelet rows
            pltpu.VMEM((8, s_b), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),  # one per treelet slot
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )
    # gridless per-tile calls, unrolled — see closest_hit_treelets_impl
    out = jnp.concatenate(
        [
            call(ts.sb_box, ts.blk_box, rays[i * Rt : (i + 1) * Rt], ts.tri)[:, 0]
            for i in range(Rp // Rt)
        ],
        axis=0,
    )
    return out[:R] > 0


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
