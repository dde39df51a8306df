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

# 128 measured fastest on v5e for sorted incoherent batches (bathroom-
# stress): smaller tiles shrink the per-tile treelet union; below 128 the
# per-visit fixed costs dominate; 256 loses on the union (re-measured
# round 5 at whole-image sort scope). 1024 exceeds the scoped-VMEM stack.
# MCPT_TREELET_TILE overrides for experiments.
import os as _os_tile

DEFAULT_RAY_TILE = int(_os_tile.environ.get("MCPT_TREELET_TILE", "128"))


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
    sb_box, blk_box_hbm, ray_ref, tri_hbm, out_t, out_id, out_uv,
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
    # DMA pipeline, BOTH levels double-buffered:
    #   * treelet triangle rows (tribuf [2,16,C], one DMA semaphore per
    #     slot): each inner iteration votes and launches the NEXT treelet's
    #     copy before waiting on the current one, so HBM->VMEM latency
    #     hides under the Moller-Trumbore wave. The next vote uses the
    #     pre-wave best_t (one treelet stale) — it can only fetch a treelet
    #     the exact schedule would also have fetched, never skip one.
    #   * superblock box tables (bb_buf [2,8,S_B], sem2 [2]): the outer
    #     loop votes the NEXT superblock before running the current one's
    #     inner loop, so its table copy hides under the whole inner loop.
    #     Round 2 started+waited this copy inline, fully exposing its
    #     latency — measured ~6 us per outer iteration on coherent primary
    #     tiles, the dominant cost when pruning leaves few treelets per
    #     superblock. The post-inner liveness recheck uses the saved key
    #     column, and a not-taken prefetch is drained before exit (a DMA
    #     must never be left in flight at kernel end).
    sbkeys = _entry_keys(sb_box, o, inv, t_lo, t_hi, bits_ns)
    sbk_ref[:] = sbkeys
    lane_ns = jax.lax.broadcasted_iota(jnp.int32, sbkeys.shape, 1)
    m0 = jnp.min(jnp.where(_entry_lb(sbkeys, bits_ns) < t_hi, sbkeys, KEY_MISS))
    s0 = m0 & ((1 << bits_ns) - 1)
    cont0 = m0 != KEY_MISS

    @pl.when(cont0)
    def _():
        pltpu.make_async_copy(blk_box_hbm.at[s0], bb_buf.at[0], sem2.at[0]).start()
        sbk_ref[:] = jnp.where(lane_ns == s0, KEY_MISS, sbkeys)

    def outer_cond(st):
        return st[0]

    def outer_body(st):
        _, sslot, s, best_t, best_id, best_u, best_v = st
        # vote + prefetch the NEXT superblock under this one's inner loop
        keys = sbk_ref[:]
        live = _entry_lb(keys, bits_ns) < best_t
        mn = jnp.min(jnp.where(live, keys, KEY_MISS))
        sn = mn & ((1 << bits_ns) - 1)
        has_next = mn != KEY_MISS
        # save sn's key column for the post-inner liveness recheck
        col_next = jnp.min(
            jnp.where(lane_ns == sn, keys, KEY_MISS), axis=1, keepdims=True
        )

        @pl.when(has_next)
        def _():
            pltpu.make_async_copy(
                blk_box_hbm.at[sn], bb_buf.at[1 - sslot], sem2.at[1 - sslot]
            ).start()
            sbk_ref[:] = jnp.where(lane_ns == sn, KEY_MISS, keys)

        # drain the current superblock's table copy
        pltpu.make_async_copy(
            blk_box_hbm.at[s], bb_buf.at[sslot], sem2.at[sslot]
        ).wait()
        bk0 = _entry_keys(
            bb_buf.at[sslot], o, inv, t_lo, jnp.minimum(t_hi, best_t), bits_sb
        )
        # Pair voting: TWO treelets per inner iteration, DMA'd into the two
        # lane-halves of one [16, 2C] buffer and intersected as ONE
        # [Rt, 2C] wave — halves the per-visit fixed cost (votes, scalar
        # work, loop control), which measured ~40% of a visit. When only
        # one live treelet remains the second half re-copies the same
        # treelet: re-testing real triangles is idempotent for closest-hit
        # and monotone for any-hit, so a duplicate is always safe.
        lane = jax.lax.broadcasted_iota(jnp.int32, bk0.shape, 1)

        def vote2(bk, bound):
            live1 = _entry_lb(bk, bits_sb) < bound
            m1 = jnp.min(jnp.where(live1, bk, KEY_MISS))
            b1 = m1 & ((1 << bits_sb) - 1)
            bk1 = jnp.where(lane == b1, KEY_MISS, bk)
            live2 = _entry_lb(bk1, bits_sb) < bound
            m2 = jnp.min(jnp.where(live2, bk1, KEY_MISS))
            has2 = m2 != KEY_MISS
            b2 = jnp.where(has2, m2 & ((1 << bits_sb) - 1), b1)
            rest = jnp.where(lane == b2, KEY_MISS, bk1)
            return m1 != KEY_MISS, b1, b2, rest

        def start_pair(slot, ba, bb2):
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + ba],
                tribuf.at[slot, :, pl.ds(0, tribuf.shape[2] // 2)],
                sem.at[slot, 0],
            ).start()
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + bb2],
                tribuf.at[slot, :, pl.ds(tribuf.shape[2] // 2, tribuf.shape[2] // 2)],
                sem.at[slot, 1],
            ).start()

        def wait_pair(slot, ba, bb2):
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + ba],
                tribuf.at[slot, :, pl.ds(0, tribuf.shape[2] // 2)],
                sem.at[slot, 0],
            ).wait()
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + bb2],
                tribuf.at[slot, :, pl.ds(tribuf.shape[2] // 2, tribuf.shape[2] // 2)],
                sem.at[slot, 1],
            ).wait()

        icont0, b0a, b0b, rest0 = vote2(bk0, best_t)
        bk_ref[:] = rest0

        @pl.when(icont0)
        def _():
            start_pair(0, b0a, b0b)

        def inner_cond(st):
            return st[0]

        def inner_body(st):
            _, slot, ba, bb2, best_t, best_id, best_u, best_v = st
            # vote + prefetch the NEXT pair into the other slot
            bk = bk_ref[:]
            has_next, na, nb, rest = vote2(bk, best_t)
            bk_ref[:] = rest

            @pl.when(has_next)
            def _():
                start_pair(1 - slot, na, nb)

            # drain the current slot's copies, then intersect the pair
            wait_pair(slot, ba, bb2)
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
            # winner's barycentrics, selected by the unique (min-t,
            # lowest-id) column: shipping u,v out of the kernel lets the
            # integrator skip gathering v0/e1/e2 per hit (the [T,36]
            # shading gather was ~as expensive as traversal at 1M tris).
            # max over the mask handles the duplicated-treelet tail pair
            # (identical columns carry bitwise-identical u,v).
            msel = (t_cand <= row_t) & (tri_id == row_id)
            row_u = jnp.max(jnp.where(msel, u, -F32_MAX), axis=1)[:, None]
            row_v = jnp.max(jnp.where(msel, v, -F32_MAX), axis=1)[:, None]
            # lowest-tri-id tie break (ops/intersect._min_and_first_index).
            # row_t == F32_MAX is the no-accept sentinel and must never tie
            # against best_t's init value (t_hi can be F32_MAX).
            better = (row_t < best_t) | ((row_t == best_t) & (row_id < best_id))
            better = better & (row_t < F32_MAX)
            best_t = jnp.where(better, row_t, best_t)
            best_id = jnp.where(better, row_id, best_id)
            best_u = jnp.where(better, row_u, best_u)
            best_v = jnp.where(better, row_v, best_v)
            return has_next, 1 - slot, na, nb, best_t, best_id, best_u, best_v

        _, _, _, _, best_t, best_id, best_u, best_v = jax.lax.while_loop(
            inner_cond, inner_body,
            (icont0, jnp.int32(0), b0a, b0b, best_t, best_id,
             best_u, best_v),
        )
        # no treelet DMA is in flight at inner exit: every prefetch is
        # launched only when has_next, and the following iteration always
        # waits on it; the final iteration (has_next = False) launches
        # nothing. Continue while the prefetched column OR any remaining
        # superblock is live under the updated best_t (checking only sn's
        # column would exit early: sn holds the global-min key, but another
        # superblock can still be live for a DIFFERENT ray). A live
        # remainder with a dead sn just wastes one cheap prologue visit.
        rem = sbk_ref[:]
        cont = has_next & (
            jnp.any(_entry_lb(col_next, bits_ns) < best_t)
            | jnp.any(_entry_lb(rem, bits_ns) < best_t)
        )

        @pl.when(has_next & ~cont)
        def _():
            pltpu.make_async_copy(
                blk_box_hbm.at[sn], bb_buf.at[1 - sslot], sem2.at[1 - sslot]
            ).wait()

        return cont, 1 - sslot, sn, best_t, best_id, best_u, best_v

    best_t = t_hi
    best_id = jnp.full((Rt, 1), ID_MISS, jnp.int32)
    zero_uv = jnp.zeros((Rt, 1), jnp.float32)
    _, _, _, best_t, best_id, best_u, best_v = jax.lax.while_loop(
        outer_cond, outer_body,
        (cont0, jnp.int32(0), s0, best_t, best_id, zero_uv, zero_uv),
    )
    hit = best_id < ID_MISS
    W = out_t.shape[1]
    out_t[:] = jnp.broadcast_to(jnp.where(hit, best_t, F32_MAX), (Rt, W))
    out_id[:] = jnp.broadcast_to(jnp.where(hit, best_id, -1), (Rt, W))
    # u in column 0's half, v in the upper half (one [Rt, W] output)
    col = jax.lax.broadcasted_iota(jnp.int32, (Rt, W), 1)
    u_b = jnp.broadcast_to(jnp.where(hit, best_u, 0.0), (Rt, W))
    v_b = jnp.broadcast_to(jnp.where(hit, best_v, 0.0), (Rt, W))
    out_uv[:] = jnp.where(col < W // 2, u_b, v_b)


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
    lane_ns = jax.lax.broadcasted_iota(jnp.int32, sbkeys.shape, 1)
    m0 = jnp.min(jnp.where(live_keys(sbkeys, found0), sbkeys, KEY_MISS))
    s0 = m0 & ((1 << bits_ns) - 1)
    cont0 = m0 != KEY_MISS

    @pl.when(cont0)
    def _():
        pltpu.make_async_copy(blk_box_hbm.at[s0], bb_buf.at[0], sem2.at[0]).start()
        sbk_ref[:] = jnp.where(lane_ns == s0, KEY_MISS, sbkeys)

    def outer_cond(st):
        return st[0]

    def outer_body(st):
        _, sslot, s, found = st
        # vote + prefetch the NEXT superblock under this one's inner loop
        # (double-buffered table copy — see _closest_kernel)
        keys = sbk_ref[:]
        live = live_keys(keys, found)
        mn = jnp.min(jnp.where(live, keys, KEY_MISS))
        sn = mn & ((1 << bits_ns) - 1)
        has_next = mn != KEY_MISS
        col_next = jnp.min(
            jnp.where(lane_ns == sn, keys, KEY_MISS), axis=1, keepdims=True
        )

        @pl.when(has_next)
        def _():
            pltpu.make_async_copy(
                blk_box_hbm.at[sn], bb_buf.at[1 - sslot], sem2.at[1 - sslot]
            ).start()
            sbk_ref[:] = jnp.where(lane_ns == sn, KEY_MISS, keys)

        pltpu.make_async_copy(
            blk_box_hbm.at[s], bb_buf.at[sslot], sem2.at[sslot]
        ).wait()
        bk0 = _entry_keys(bb_buf.at[sslot], o, inv, t_lo, t_hi, bits_sb)
        # pair-voted double-buffered treelet pipeline (see _closest_kernel)
        lane = jax.lax.broadcasted_iota(jnp.int32, bk0.shape, 1)

        def vote2(bk, fnd):
            live1 = live_keys(bk, fnd)
            m1 = jnp.min(jnp.where(live1, bk, KEY_MISS))
            b1 = m1 & ((1 << bits_sb) - 1)
            bk1 = jnp.where(lane == b1, KEY_MISS, bk)
            m2 = jnp.min(jnp.where(live_keys(bk1, fnd), bk1, KEY_MISS))
            has2 = m2 != KEY_MISS
            b2 = jnp.where(has2, m2 & ((1 << bits_sb) - 1), b1)
            rest = jnp.where(lane == b2, KEY_MISS, bk1)
            return m1 != KEY_MISS, b1, b2, rest

        def start_pair(slot, ba, bb2):
            half = tribuf.shape[2] // 2
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + ba],
                tribuf.at[slot, :, pl.ds(0, half)], sem.at[slot, 0],
            ).start()
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + bb2],
                tribuf.at[slot, :, pl.ds(half, half)], sem.at[slot, 1],
            ).start()

        def wait_pair(slot, ba, bb2):
            half = tribuf.shape[2] // 2
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + ba],
                tribuf.at[slot, :, pl.ds(0, half)], sem.at[slot, 0],
            ).wait()
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + bb2],
                tribuf.at[slot, :, pl.ds(half, half)], sem.at[slot, 1],
            ).wait()

        icont0, b0a, b0b, rest0 = vote2(bk0, found)
        bk_ref[:] = rest0

        @pl.when(icont0)
        def _():
            start_pair(0, b0a, b0b)

        def inner_cond(st):
            return st[0]

        def inner_body(st):
            _, slot, ba, bb2, found = st
            bk = bk_ref[:]
            has_next, na, nb, rest = vote2(bk, found)
            bk_ref[:] = rest

            @pl.when(has_next)
            def _():
                start_pair(1 - slot, na, nb)

            wait_pair(slot, ba, bb2)
            # any-hit predicate: inclusive interval, 1e-6 det eps
            # (reference Triangle::isIntersect, src/Triangle.cpp:83-106)
            t, u, v, ok, _ = _mt_wave(tribuf.at[slot], o, d, t_lo, 1e-6)
            accept = (
                ok & (t >= t_lo) & (t <= t_hi)
                & (u >= 0) & (u <= 1.0) & (v >= 0) & (u + v <= 1.0)
            )
            found = found | jnp.any(accept, axis=1)[:, None].astype(jnp.int32)
            return has_next, 1 - slot, na, nb, found

        _, _, _, _, found = jax.lax.while_loop(
            inner_cond, inner_body, (icont0, jnp.int32(0), b0a, b0b, found)
        )
        # recheck: continue while the prefetched column OR any remaining
        # superblock still matters to an unoccluded ray (sn's column alone
        # would exit early — see _closest_kernel); drain the in-flight
        # table copy when exiting
        rem = sbk_ref[:]
        cont = has_next & (
            jnp.any((found == 0) & (col_next != KEY_MISS))
            | jnp.any(live_keys(rem, found))
        )

        @pl.when(has_next & ~cont)
        def _():
            pltpu.make_async_copy(
                blk_box_hbm.at[sn], bb_buf.at[1 - sslot], sem2.at[1 - sslot]
            ).wait()

        return cont, 1 - sslot, sn, found

    _, _, _, found = jax.lax.while_loop(
        outer_cond, outer_body, (cont0, jnp.int32(0), s0, found0)
    )
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

    # ONE kernel with a grid over ray tiles: the program size and compile
    # time are independent of the ray-batch size, and the runtime pipelines
    # tile blocks. (Round-2 unrolled one gridless call per tile because
    # grid + manual DMA wedged the then-current TPU runtime; re-probed via
    # a grid x DMA x while probe — all variants now pass.)
    n_tiles = Rp // Rt
    out_t, out_id, out_uv = pl.pallas_call(
        functools.partial(
            _closest_kernel, bits_ns=bits_ns, bits_sb=bits_sb, s_b=s_b
        ),
        grid=(n_tiles,),
        out_shape=(
            jax.ShapeDtypeStruct((Rp, 128), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 128), jnp.int32),
            jax.ShapeDtypeStruct((Rp, 128), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((8, nsp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Rt, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((Rt, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Rt, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Rt, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((Rt, nsp), jnp.int32),
            pltpu.VMEM((Rt, s_b), jnp.int32),
            pltpu.VMEM((2, 16, 2 * c), jnp.float32),  # 2 slots x treelet pair
            pltpu.VMEM((2, 8, s_b), jnp.float32),  # double-buffered SB tables
            pltpu.SemaphoreType.DMA((2, 2)),  # one per (slot, pair half)
            pltpu.SemaphoreType.DMA((2,)),  # one per SB-table slot
        ],
        interpret=interpret,
    )(ts.sb_box, ts.blk_box, rays, ts.tri)
    return out_t[:R, 0], out_id[:R, 0], out_uv[:R, 0], out_uv[:R, 64]


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

    # grid over ray tiles — see closest_hit_treelets_impl
    n_tiles = Rp // Rt
    out = pl.pallas_call(
        functools.partial(
            _any_kernel, bits_ns=bits_ns, bits_sb=bits_sb, s_b=s_b
        ),
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((Rp, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec((8, nsp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Rt, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (Rt, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((Rt, nsp), jnp.int32),
            pltpu.VMEM((Rt, s_b), jnp.int32),
            pltpu.VMEM((2, 16, 2 * c), jnp.float32),  # 2 slots x treelet pair
            pltpu.VMEM((2, 8, s_b), jnp.float32),  # double-buffered SB tables
            pltpu.SemaphoreType.DMA((2, 2)),  # one per (slot, pair half)
            pltpu.SemaphoreType.DMA((2,)),  # one per SB-table slot
        ],
        interpret=interpret,
    )(ts.sb_box, ts.blk_box, rays, ts.tri)
    return out[:R, 0] > 0


def _ray_sort_order(ts: TreeletSet, org, dirn):
    """Permutation grouping rays by (direction octant, origin Morton,
    direction Morton).

    The kernel's per-tile cost is the UNION of treelets any ray in the
    tile wants, so incoherent (bounce/shadow) batches pay the union's
    width. Round 3 sorted by (first superblock, entry depth) via a full
    [R, NSp] slab pre-pass; round 4 measured a spatial-directional Morton
    key better in-program on the bathroom stress (closest 33.9 -> 30.3
    ms/iter at spp=8: it groups deep-bounce rays the entry-superblock key
    scatters) AND cheaper (no slab pass, one argsort ~0.4 ms at 32k).
    The direction Morton MINOR bits cover the degenerate-but-common case
    where every origin coincides (camera-ray batches from one eye point:
    origin bits are all equal and the octant alone left tiles mixing
    wildly different directions — measured 0.7 vs 1.5 Mrays/s on 65k
    position-scrambled primaries without them). Scene bounds come from
    the superblock table.
    """
    lo = ts.sb_box[0:3, :].T  # [NSp, 3]
    hi = ts.sb_box[3:6, :].T
    valid = ts.sb_box[6, :] > 0
    smin = jnp.where(valid[:, None], lo, jnp.inf).min(axis=0)
    smax = jnp.where(valid[:, None], hi, -jnp.inf).max(axis=0)
    ext = jnp.maximum(smax - smin, 1e-6)
    q = jnp.clip((org - smin) / ext * 31.0, 0, 31).astype(jnp.int32)  # 5b
    qd = jnp.clip((dirn * 0.5 + 0.5) * 15.0, 0, 15).astype(jnp.int32)  # 4b

    def spread(x, bits):  # interleave `bits` bits with 2-bit gaps
        r = jnp.zeros_like(x)
        for b in range(bits):
            r = r | (((x >> b) & 1) << (3 * b))
        return r

    octant = (
        ((dirn[:, 0] > 0).astype(jnp.int32) << 2)
        | ((dirn[:, 1] > 0).astype(jnp.int32) << 1)
        | (dirn[:, 2] > 0).astype(jnp.int32)
    )
    m_o = (spread(q[:, 0], 5) << 2) | (spread(q[:, 1], 5) << 1) | spread(q[:, 2], 5)
    m_d = (spread(qd[:, 0], 4) << 2) | (spread(qd[:, 1], 4) << 1) | spread(qd[:, 2], 4)
    key = (octant << 27) | (m_o << 12) | m_d  # 3 + 15 + 12 = 30 bits
    return jnp.argsort(key, stable=True)


def _default_interpret() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return True


import os as _os

# Treelet selection mechanism: "vote" (pair votes, round 4) or "smem"
# (SMEM-mediated column-min walk, ops/pallas/select.py — eliminates the
# two per-pair scalar extractions). Same results bitwise (tested).
TREELET_SELECT = _os.environ.get("MCPT_TREELET_SELECT", "vote")
if TREELET_SELECT not in ("vote", "smem"):
    raise ValueError(
        f"MCPT_TREELET_SELECT={TREELET_SELECT!r} not in ('vote', 'smem')"
    )


@functools.partial(jax.jit, static_argnames=("ray_tile", "interpret"))
def _closest_sorted(ts, org, dirn, t_min, t_max, ray_tile, interpret):
    order = _ray_sort_order(ts, org, dirn)
    tM = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (org.shape[0],))
    if TREELET_SELECT == "smem" and not interpret:
        from mcpt_tpu.ops.pallas.select import closest_hit_treelets_smem

        t_s, tri_s, u_s, v_s = closest_hit_treelets_smem(
            ts, org[order], dirn[order], t_min, tM[order], ray_tile=ray_tile
        )
    else:
        t_s, tri_s, u_s, v_s = closest_hit_treelets_impl(
            ts, org[order], dirn[order], t_min, tM[order],
            ray_tile=ray_tile, interpret=interpret,
        )
    t = jnp.zeros_like(t_s).at[order].set(t_s)
    tri = jnp.zeros_like(tri_s).at[order].set(tri_s)
    u = jnp.zeros_like(u_s).at[order].set(u_s)
    v = jnp.zeros_like(v_s).at[order].set(v_s)
    return t, tri, u, v


@functools.partial(jax.jit, static_argnames=("ray_tile", "interpret"))
def _any_sorted(ts, org, dirn, t_min, t_max, ray_tile, interpret):
    order = _ray_sort_order(ts, org, dirn)
    tM = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (org.shape[0],))
    if TREELET_SELECT == "smem" and not interpret:
        from mcpt_tpu.ops.pallas.select import any_hit_treelets_smem

        hit_s = any_hit_treelets_smem(
            ts, org[order], dirn[order], t_min, tM[order], ray_tile=ray_tile
        )
    else:
        hit_s = any_hit_treelets_impl(
            ts, org[order], dirn[order], t_min, tM[order],
            ray_tile=ray_tile, interpret=interpret,
        )
    return jnp.zeros_like(hit_s).at[order].set(hit_s)


def closest_hit_treelets(
    scene, org, dirn, t_min=1e-4, t_max=F32_MAX,
    ray_tile: int = DEFAULT_RAY_TILE, interpret: bool = None,
    sort_rays: bool = True,
):
    """Hit record (ops/intersect.Hit) via the Pallas megakernel."""
    from mcpt_tpu.ops.intersect import Hit

    if interpret is None:
        interpret = _default_interpret()
    if sort_rays and org.shape[0] > ray_tile:
        t, tri, u, v = _closest_sorted(
            scene.treelets, org, dirn, t_min, t_max, ray_tile, interpret
        )
    else:
        t, tri, u, v = closest_hit_treelets_impl(
            scene.treelets, org, dirn, t_min, t_max,
            ray_tile=ray_tile, interpret=interpret,
        )
    return Hit(t=t, tri=tri, u=u, v=v)


def any_hit_treelets(
    scene, org, dirn, t_min=1e-4, t_max=F32_MAX,
    ray_tile: int = DEFAULT_RAY_TILE, interpret: bool = None,
    sort_rays: bool = True,
):
    # (measured round 5: skipping this sort to "inherit" the primary
    # batch's order costs ~2x e2e — wavefront lanes hold MIXED bounce
    # depths, so shadow origins scatter even when the closest batch sorts)
    if interpret is None:
        interpret = _default_interpret()
    if sort_rays and org.shape[0] > ray_tile:
        return _any_sorted(
            scene.treelets, org, dirn, t_min, t_max, ray_tile, interpret
        )
    return any_hit_treelets_impl(
        scene.treelets, org, dirn, t_min, t_max,
        ray_tile=ray_tile, interpret=interpret,
    )
