"""Treelet kernels with SMEM-mediated treelet selection (round 5).

The voted kernels (ops/pallas/traverse.py) pay ~1.94 us per treelet PAIR
for selection: two tile-min reductions and two VECTOR->SCALAR extractions
(~1 us each — the scalar-core round trip is the atom, tools/micro_visit.py,
and source-level pipelining cannot hide it). These kernels replace the
per-pair vote with ONE column-min per superblock:

    bk0    = per-ray entry keys [Rt, S_B]      (as voted, best_t-masked)
    colmin = min over rays -> [1, S_B]         (one vector reduction)
    DMA colmin -> SMEM                         (~2 us, once per superblock)
    walk slots 0..S_B-1 on the SCALAR core     (SMEM reads cost ~ns, not
                                                the 1 us extract)

Slot-order visiting loses the voted kernel's within-superblock
front-to-back order; pruning instead uses a CUTOFF — the tile's max
best_t as monotone int bits, refreshed into SMEM every CUT_REFRESH pairs
(one amortized scalar round trip). Superblocks themselves are still
visited front-to-back by the outer vote, which amortizes over the ~8-16
pairs inside. Accept predicates, tie break, and results are IDENTICAL to
the voted kernels (same _mt_wave, same key construction) — tested
bitwise-equal.

Opt-in via MCPT_TREELET_SELECT=smem until measured faster.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcpt_tpu.ops.pallas.traverse import (
    DEFAULT_RAY_TILE,
    F32_MAX,
    ID_MISS,
    KEY_MISS,
    _bits,
    _entry_keys,
    _entry_lb,
    _mt_wave,
    _pack_rays,
)
from mcpt_tpu.ops.treelets import TreeletSet

CUT_REFRESH = 4  # pairs between cutoff refreshes (scalar round trips)


def _bits_cast_max(best_t):
    """Monotone int32 bits of max(best_t) (best_t >= 0 always)."""
    return jnp.max(jax.lax.bitcast_convert_type(best_t, jnp.int32))


def _scan_slot(skeys, j0, cut, s_b, bits_sb, check_cut):
    """First slot >= j0 whose colmin key is live (scalar-core walk).

    Returns (slot, found); slot == s_b when none. check_cut=False (any-hit)
    skips the entry-vs-cutoff compare.
    """

    def cond(c):
        j, found = c
        return (~found) & (j < s_b)

    def body(c):
        j, _ = c
        k = skeys[0, j]
        ok = k != KEY_MISS
        if check_cut:
            ok = ok & (((k >> bits_sb) << bits_sb) < cut)
        return jnp.where(ok, j, j + 1), ok

    j, found = jax.lax.while_loop(cond, body, (j0, jnp.asarray(False)))
    return j, found


def _closest_kernel(
    sb_box, blk_box_hbm, ray_ref, tri_hbm, out_t, out_id, out_uv,
    sbk_ref, tribuf, bb_buf, vcm, skeys, scut, sem, sem2, semc,
    *, bits_ns, bits_sb, s_b,
):
    rays = ray_ref[:]
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    inv = rays[:, 6:9]
    t_lo = rays[:, 9][:, None]
    t_hi = rays[:, 10][:, None]
    Rt = rays.shape[0]

    # ---- outer superblock loop: identical to the voted kernel (votes are
    # amortized over a whole superblock; see traverse._closest_kernel for
    # the DMA-pipeline discipline notes)
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
        keys = sbk_ref[:]
        live = _entry_lb(keys, bits_ns) < best_t
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

        # ---- SMEM-mediated treelet selection (replaces the pair vote)
        bk0 = _entry_keys(
            bb_buf.at[sslot], o, inv, t_lo, jnp.minimum(t_hi, best_t), bits_sb
        )
        # full-height broadcast store (a 1-row sublane slice store is
        # layout-fragile in Mosaic; rows 1..7 are dead weight in a 4 KB DMA)
        vcm[:] = jnp.broadcast_to(jnp.min(bk0, axis=0)[None, :], vcm.shape)
        cpc = pltpu.make_async_copy(vcm, skeys, semc)
        cpc.start()
        cut0 = _bits_cast_max(best_t)  # one scalar round trip per superblock
        cpc.wait()
        scut[0] = cut0

        def start_pair(slot, ja, jb):
            half = tribuf.shape[2] // 2
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + ja],
                tribuf.at[slot, :, pl.ds(0, half)], sem.at[slot, 0],
            ).start()
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + jb],
                tribuf.at[slot, :, pl.ds(half, half)], sem.at[slot, 1],
            ).start()

        def wait_pair(slot, ja, jb):
            half = tribuf.shape[2] // 2
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + ja],
                tribuf.at[slot, :, pl.ds(0, half)], sem.at[slot, 0],
            ).wait()
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + jb],
                tribuf.at[slot, :, pl.ds(half, half)], sem.at[slot, 1],
            ).wait()

        def pick_pair(j0):
            ja, fa = _scan_slot(skeys, j0, scut[0], s_b, bits_sb, True)
            jb, fb = _scan_slot(skeys, ja + 1, scut[0], s_b, bits_sb, True)
            jb = jnp.where(fb, jb, ja)  # duplicate = idempotent re-test
            return fa, ja, jb

        f0, j0a, j0b = pick_pair(jnp.int32(0))

        @pl.when(f0)
        def _():
            start_pair(0, j0a, j0b)

        def inner_cond(st):
            return st[0]

        def inner_body(st):
            _, slot, ja, jb, nxt, pair_i, best_t, best_id, best_u, best_v = st
            has_next, na, nb = pick_pair(nxt)

            @pl.when(has_next)
            def _():
                start_pair(1 - slot, na, nb)

            wait_pair(slot, ja, jb)
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
            msel = (t_cand <= row_t) & (tri_id == row_id)
            row_u = jnp.max(jnp.where(msel, u, -F32_MAX), axis=1)[:, None]
            row_v = jnp.max(jnp.where(msel, v, -F32_MAX), axis=1)[:, None]
            better = (row_t < best_t) | ((row_t == best_t) & (row_id < best_id))
            better = better & (row_t < F32_MAX)
            best_t = jnp.where(better, row_t, best_t)
            best_id = jnp.where(better, row_id, best_id)
            best_u = jnp.where(better, row_u, best_u)
            best_v = jnp.where(better, row_v, best_v)

            # refresh the pruning cutoff every CUT_REFRESH pairs (the only
            # recurring scalar round trip in the inner loop)
            @pl.when(has_next & (pair_i % CUT_REFRESH == CUT_REFRESH - 1))
            def _():
                scut[0] = _bits_cast_max(best_t)

            return (has_next, 1 - slot, na, nb, nb + 1, pair_i + 1,
                    best_t, best_id, best_u, best_v)

        (_, _, _, _, _, _, best_t, best_id, best_u, best_v) = jax.lax.while_loop(
            inner_cond, inner_body,
            (f0, jnp.int32(0), j0a, j0b, j0b + 1, jnp.int32(0),
             best_t, best_id, best_u, best_v),
        )

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
    col = jax.lax.broadcasted_iota(jnp.int32, (Rt, W), 1)
    u_b = jnp.broadcast_to(jnp.where(hit, best_u, 0.0), (Rt, W))
    v_b = jnp.broadcast_to(jnp.where(hit, best_v, 0.0), (Rt, W))
    out_uv[:] = jnp.where(col < W // 2, u_b, v_b)


def _any_kernel(
    sb_box, blk_box_hbm, ray_ref, tri_hbm, out_hit,
    sbk_ref, tribuf, bb_buf, vcm, skeys, scut, sem, sem2, semc,
    *, bits_ns, bits_sb, s_b,
):
    rays = ray_ref[:]
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    inv = rays[:, 6:9]
    t_lo = rays[:, 9][:, None]
    t_hi = rays[:, 10][:, None]
    Rt = rays.shape[0]

    def live_keys(keys, found):
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
        bk0 = jnp.where(found == 0, bk0, KEY_MISS)
        # full-height broadcast store (a 1-row sublane slice store is
        # layout-fragile in Mosaic; rows 1..7 are dead weight in a 4 KB DMA)
        vcm[:] = jnp.broadcast_to(jnp.min(bk0, axis=0)[None, :], vcm.shape)
        cpc = pltpu.make_async_copy(vcm, skeys, semc)
        cpc.start()
        cpc.wait()
        scut[0] = jnp.int32(1)  # 1 = keep going, 0 = every ray blocked

        def start_pair(slot, ja, jb):
            half = tribuf.shape[2] // 2
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + ja],
                tribuf.at[slot, :, pl.ds(0, half)], sem.at[slot, 0],
            ).start()
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + jb],
                tribuf.at[slot, :, pl.ds(half, half)], sem.at[slot, 1],
            ).start()

        def wait_pair(slot, ja, jb):
            half = tribuf.shape[2] // 2
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + ja],
                tribuf.at[slot, :, pl.ds(0, half)], sem.at[slot, 0],
            ).wait()
            pltpu.make_async_copy(
                tri_hbm.at[s * s_b + jb],
                tribuf.at[slot, :, pl.ds(half, half)], sem.at[slot, 1],
            ).wait()

        def pick_pair(j0):
            ja, fa = _scan_slot(skeys, j0, scut[0], s_b, bits_sb, False)
            jb, fb = _scan_slot(skeys, ja + 1, scut[0], s_b, bits_sb, False)
            jb = jnp.where(fb, jb, ja)
            return fa, ja, jb

        f0, j0a, j0b = pick_pair(jnp.int32(0))

        @pl.when(f0)
        def _():
            start_pair(0, j0a, j0b)

        def inner_cond(st):
            return st[0]

        def inner_body(st):
            _, slot, ja, jb, nxt, pair_i, found = st
            has_next, na, nb = pick_pair(nxt)

            @pl.when(has_next)
            def _():
                start_pair(1 - slot, na, nb)

            wait_pair(slot, ja, jb)
            t, u, v, ok, _ = _mt_wave(tribuf.at[slot], o, d, t_lo, 1e-6)
            accept = (
                ok & (t >= t_lo) & (t <= t_hi)
                & (u >= 0) & (u <= 1.0) & (v >= 0) & (u + v <= 1.0)
            )
            found = found | jnp.any(accept, axis=1)[:, None].astype(jnp.int32)

            # every CUT_REFRESH pairs: stop if every schedulable ray is
            # occluded (masked rays with t_hi <= t_lo can never be found)
            @pl.when(has_next & (pair_i % CUT_REFRESH == CUT_REFRESH - 1))
            def _():
                blocked = found | (t_hi <= t_lo).astype(jnp.int32)
                scut[0] = jnp.where(jnp.min(blocked) == 1,
                                    jnp.int32(0), jnp.int32(1))

            cont = has_next & (scut[0] == 1)

            @pl.when(has_next & ~cont)
            def _():
                wait_pair(1 - slot, na, nb)

            return cont, 1 - slot, na, nb, nb + 1, pair_i + 1, found

        _, _, _, _, _, _, found = jax.lax.while_loop(
            inner_cond, inner_body,
            (f0, jnp.int32(0), j0a, j0b, j0b + 1, jnp.int32(0), found),
        )

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


def _scratch(Rt, nsp, s_b, c):
    return [
        pltpu.VMEM((Rt, nsp), jnp.int32),  # sbk_ref
        pltpu.VMEM((2, 16, 2 * c), jnp.float32),  # tribuf pair slots
        pltpu.VMEM((2, 8, s_b), jnp.float32),  # double-buffered SB tables
        pltpu.VMEM((8, s_b), jnp.int32),  # vcm (colmin staging row)
        pltpu.SMEM((8, s_b), jnp.int32),  # skeys
        pltpu.SMEM((1,), jnp.int32),  # scut
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA,  # colmin copy
    ]


@functools.partial(jax.jit, static_argnames=("ray_tile",))
def closest_hit_treelets_smem(
    ts: TreeletSet, org, dirn, t_min, t_max, ray_tile: int = DEFAULT_RAY_TILE
):
    nsp = ts.sb_box.shape[1]
    ns, _, s_b = ts.blk_box.shape
    c = ts.c
    bits_ns = _bits(nsp)
    bits_sb = _bits(s_b)
    rays, R, Rp = _pack_rays(org, dirn, t_min, t_max, ray_tile)
    Rt = min(ray_tile, Rp)
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
        scratch_shapes=_scratch(Rt, nsp, s_b, c),
    )(ts.sb_box, ts.blk_box, rays, ts.tri)
    return out_t[:R, 0], out_id[:R, 0], out_uv[:R, 0], out_uv[:R, 64]


@functools.partial(jax.jit, static_argnames=("ray_tile",))
def any_hit_treelets_smem(
    ts: TreeletSet, org, dirn, t_min, t_max, ray_tile: int = DEFAULT_RAY_TILE
):
    nsp = ts.sb_box.shape[1]
    ns, _, s_b = ts.blk_box.shape
    c = ts.c
    bits_ns = _bits(nsp)
    bits_sb = _bits(s_b)
    rays, R, Rp = _pack_rays(org, dirn, t_min, t_max, ray_tile)
    Rt = min(ray_tile, Rp)
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
        scratch_shapes=_scratch(Rt, nsp, s_b, c),
    )(ts.sb_box, ts.blk_box, rays, ts.tri)
    return out[:R, 0] > 0
