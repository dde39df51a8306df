"""Schedule-fed Pallas treelet traversal: the round-5 vote-elimination kernel.

The round-4 voted megakernel (ops/pallas/traverse.py) is architecturally
bound at ~4.6 us per treelet-pair visit, half of which is the per-visit
VOTE — two tile-min reductions + two scalar-core extractions (~1 us each,
tools/micro_visit.py). This kernel ELIMINATES the vote: a cheap XLA
pre-pass computes each ray tile's treelet visit list up front, and the
kernel just walks it.

  pre-pass (XLA, build_schedule):
    1. bundle bounds per tile: componentwise origin/direction intervals
       over the tile's valid rays (the classic packet-tracing frustum,
       interval-arithmetic slab test) — conservative: a treelet is culled
       only if NO ray in the tile can hit its AABB within [t_lo, t_hi]
    2. one [n_tiles, G] interval slab pass over ALL treelet AABBs
       (G = NS * S_B global rows of ts.tri; same box semantics as the
       voted kernel incl. the reference's 1.001 far fudge, src/AABB.cpp)
    3. per tile: pack hits as int32 keys (high bits = f32 bits of the
       conservative entry lower bound, low bits = treelet row id), sort
       ascending = front-to-back, truncate to V entries
  kernel (one pallas_call, grid over tiles):
    1. ONE DMA pulls the tile's [4, V/4] schedule row HBM -> SMEM
       (tools/probe_smem_dma.py: works for any V; whole-array SMEM
       operands are NOT needed)
    2. walk the schedule two treelets per iteration: read ids from SMEM,
       double-buffered pair DMA HBM -> VMEM, one [Rt, 2C] Moller-Trumbore
       wave, best-hit update — NO votes, NO superblock level
    3. early exit every 4 pairs: the next entry's lower bound (int-space,
       f32-monotone) vs max over the tile of best_t, computed under
       pl.when into an SMEM flag so the scalar extraction is amortized

  truncation safety: a tile with more than V live treelets is flagged
  incomplete; the wrapper re-runs JUST those tiles' rays through the exact
  voted kernel under lax.cond (zero device cost when nothing truncated)
  and merges. No hit can be lost.

Correctness contract: identical accept predicates and (min-t, lowest-id)
tie break as ops/intersect's dense path and the voted kernel (reference
src/Triangle.cpp:48-106), so results match brute force up to f32 rounding.
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
    _mt_wave,
    _pack_rays,
    _ray_sort_order,
)
from mcpt_tpu.ops.treelets import TreeletSet

# Schedule capacity per tile. Must be a multiple of 512 (the HBM row is
# [4, V/4] with V/4 a lane multiple). Sized from measurement on the
# bathroom stress (see tools/bench_schedule.py): mixed wavefront batches
# union to ~40-90 pair-visits (80-180 treelets) per 128-ray tile; 512 gives
# ~3x headroom before the (correct, exact) incomplete-tile fallback kicks
# in. MCPT_SCHED_V overrides.
DEFAULT_V = 512

# Early-exit check period (pairs). Each check costs ~1 us (scalar-core
# round trip); each pair costs ~3 us — every 4th pair ≈ 8% overhead for
# front-to-back termination.
CHECK_PERIOD = 4

_DEAD_ORIGIN = 1e29  # |o| beyond this marks the integrator's parked lanes


def _bits_for(n: int) -> int:
    return max(1, int(np.ceil(np.log2(max(n, 2)))))


# ---------------------------------------------------------------------------
# XLA pre-pass
# ---------------------------------------------------------------------------


def _bundle_bounds(rays, n_tiles, rt):
    """Componentwise origin/direction/t intervals per tile, masked to rays
    that can accept a hit at all (t_lo < t_hi, origin inside the world).

    rays: [Rp, 16] packed (o, d, inv, t_lo, t_hi, pad) from _pack_rays.
    Returns (olo, ohi, dlo, dhi [n_tiles,3], tlo_min, thi_max [n_tiles]).
    Empty tiles produce +inf/-inf bounds -> NaN slab -> zero schedule.
    """
    o = rays[:, 0:3].reshape(n_tiles, rt, 3)
    d = rays[:, 3:6].reshape(n_tiles, rt, 3)
    t_lo = rays[:, 9].reshape(n_tiles, rt)
    t_hi = rays[:, 10].reshape(n_tiles, rt)
    valid = (t_lo < t_hi) & (jnp.max(jnp.abs(o), axis=-1) < _DEAD_ORIGIN)
    v3 = valid[..., None]
    olo = jnp.min(jnp.where(v3, o, jnp.inf), axis=1)
    ohi = jnp.max(jnp.where(v3, o, -jnp.inf), axis=1)
    dlo = jnp.min(jnp.where(v3, d, jnp.inf), axis=1)
    dhi = jnp.max(jnp.where(v3, d, -jnp.inf), axis=1)
    tlo_min = jnp.min(jnp.where(valid, t_lo, jnp.inf), axis=1)
    thi_max = jnp.max(jnp.where(valid, t_hi, -jnp.inf), axis=1)
    return olo, ohi, dlo, dhi, tlo_min, thi_max


def _interval_slab(olo, ohi, dlo, dhi, tlo, thi, blo, bhi, valid_box):
    """Conservative bundle-vs-AABB test + entry lower bound.

    olo..dhi: [n_tiles, 3]; blo/bhi: [G, 3]; returns (hit [n_tiles, G],
    entry_lb [n_tiles, G]). Interval arithmetic per axis; a mixed-sign
    direction axis is treated as unbounded (always passes that axis).
    """
    near = jnp.full((olo.shape[0], blo.shape[0]), -jnp.inf, jnp.float32)
    far = jnp.full_like(near, jnp.inf)
    for a in range(3):
        pos = dlo[:, a] > 0.0
        neg = dhi[:, a] < 0.0
        ok = pos | neg
        # inverse-direction interval (same sign): [1/dhi, 1/dlo] for pos,
        # [1/dhi, 1/dlo] also for neg (both negative, dhi closer to 0)
        safe_lo = jnp.where(ok, dlo[:, a], 1.0)
        safe_hi = jnp.where(ok, dhi[:, a], 1.0)
        ilo = 1.0 / safe_hi
        ihi = 1.0 / safe_lo
        ilo, ihi = jnp.minimum(ilo, ihi), jnp.maximum(ilo, ihi)
        ilo = ilo[:, None]
        ihi = ihi[:, None]

        def t_int(b):
            q_lo = b[None, :] - ohi[:, a][:, None]
            q_hi = b[None, :] - olo[:, a][:, None]
            p1 = q_lo * ilo
            p2 = q_lo * ihi
            p3 = q_hi * ilo
            p4 = q_hi * ihi
            return (
                jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)),
            )

        t1_lb, t1_ub = t_int(blo[:, a])
        t2_lb, t2_ub = t_int(bhi[:, a])
        near_a = jnp.minimum(t1_lb, t2_lb)
        far_a = jnp.maximum(t1_ub, t2_ub)
        # reference per-axis far fudge (AABB.cpp: far * 1.001); a negative
        # upper bound already rejects every ray, scaling keeps it negative
        far_a = jnp.where(far_a > 0, far_a * 1.001, far_a)
        mixed = (~pos & ~neg)[:, None]
        near = jnp.maximum(near, jnp.where(mixed, -jnp.inf, near_a))
        far = jnp.minimum(far, jnp.where(mixed, jnp.inf, far_a))
    lo = jnp.maximum(tlo[:, None], near)
    hi = jnp.minimum(thi[:, None], far)
    hit = valid_box[None, :] & (lo < hi)
    # NaN bounds (empty tile) compare False -> no hits
    entry = jnp.maximum(near, 0.0)
    return hit, entry


@functools.partial(jax.jit, static_argnames=("ray_tile", "v"))
def build_schedule(ts: TreeletSet, rays, ray_tile: int, v: int):
    """[n_tiles, 4, v/4] i32 schedule + incomplete [n_tiles] bool.

    rays: [Rp, 16] packed, Rp a multiple of ray_tile, ALREADY sorted for
    coherence. Entries are packed (entry_lb | treelet_row) keys sorted
    front-to-back per tile; KEY_MISS-padded. incomplete[i] marks a tile
    whose live set exceeded v (the wrapper falls back exactly).
    """
    g_total = ts.blk_box.shape[0] * ts.blk_box.shape[2]
    bits_g = _bits_for(g_total)
    n_tiles = rays.shape[0] // ray_tile

    # all treelet boxes, globally indexed: blk_box [NS, 8, S_B] rows are
    # lo.xyz hi.xyz valid pad -> [G, 3]/[G]
    bb = jnp.transpose(ts.blk_box, (0, 2, 1)).reshape(g_total, 8)
    blo = bb[:, 0:3]
    bhi = bb[:, 3:6]
    valid_box = bb[:, 6] > 0.0

    olo, ohi, dlo, dhi, tlo, thi = _bundle_bounds(rays, n_tiles, ray_tile)
    hit, entry = _interval_slab(olo, ohi, dlo, dhi, tlo, thi, blo, bhi,
                                valid_box)

    fb = jax.lax.bitcast_convert_type(
        jnp.minimum(entry, F32_MAX), jnp.int32
    )
    gid = jax.lax.broadcasted_iota(jnp.int32, hit.shape, 1)
    key = ((fb >> bits_g) << bits_g) | gid
    key = jnp.where(hit, key, KEY_MISS)
    n_live = jnp.sum(hit, axis=1)
    incomplete = n_live > v
    if key.shape[1] < v:
        # fewer treelets than schedule capacity (tiny scenes): pad columns
        # so the [n_tiles, 4, v/4] reshape below is always valid
        key = jnp.pad(key, ((0, 0), (0, v - key.shape[1])),
                      constant_values=KEY_MISS)
    sched = jax.lax.sort(key, dimension=1)[:, :v]
    # a truncated schedule may not be executed at all (dropped visits can
    # hide the true closest hit): blank it so the kernel exits the tile
    # immediately and ONLY the exact fallback pays for it
    sched = jnp.where(incomplete[:, None], KEY_MISS, sched)
    return sched.reshape(n_tiles, 4, v // 4), incomplete, n_live


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _sched_pair(sbuf, p, vq_shift, vq_mask, bits_g, n_pairs):
    """Read schedule pair p from SMEM -> (has, ga, gb, key_a).

    p is clamped to the last pair: the caller may probe "one past" while
    prefetching, and an un-clamped read of a FULL (truncated) schedule
    would index past the [4, V/4] SMEM block.
    """
    pc = jnp.minimum(p, jnp.int32(n_pairs - 1))
    in_range = p < n_pairs
    va = 2 * pc
    vb = 2 * pc + 1
    ka = sbuf[va >> vq_shift, va & vq_mask]
    kb = sbuf[vb >> vq_shift, vb & vq_mask]
    has = in_range & (ka != KEY_MISS)
    gmask = (1 << bits_g) - 1
    ga = ka & gmask
    gb = jnp.where(kb != KEY_MISS, kb & gmask, ga)  # duplicate = idempotent
    return has, ga, gb, ka


def _start_pair(tri_hbm, tribuf, sem, slot, ga, gb):
    half = tribuf.shape[2] // 2
    pltpu.make_async_copy(
        tri_hbm.at[ga], tribuf.at[slot, :, pl.ds(0, half)], sem.at[slot, 0]
    ).start()
    pltpu.make_async_copy(
        tri_hbm.at[gb], tribuf.at[slot, :, pl.ds(half, half)], sem.at[slot, 1]
    ).start()


def _wait_pair(tri_hbm, tribuf, sem, slot, ga, gb):
    half = tribuf.shape[2] // 2
    pltpu.make_async_copy(
        tri_hbm.at[ga], tribuf.at[slot, :, pl.ds(0, half)], sem.at[slot, 0]
    ).wait()
    pltpu.make_async_copy(
        tri_hbm.at[gb], tribuf.at[slot, :, pl.ds(half, half)], sem.at[slot, 1]
    ).wait()


def _closest_kernel(
    sched_hbm, ray_ref, tri_hbm, out_t, out_id, out_uv,
    sbuf, tribuf, sflag, sem_s, sem, *, v, bits_g,
):
    vq = sbuf.shape[1]
    vq_shift = int(np.log2(vq))
    vq_mask = vq - 1

    i = pl.program_id(0)
    cps = pltpu.make_async_copy(sched_hbm.at[i], sbuf, sem_s)
    cps.start()

    rays = ray_ref[:]
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    t_lo = rays[:, 9][:, None]
    t_hi = rays[:, 10][:, None]
    Rt = rays.shape[0]

    cps.wait()
    sflag[0] = jnp.int32(1)
    n_pairs = v // 2
    has0, g0a, g0b, _ = _sched_pair(
        sbuf, jnp.int32(0), vq_shift, vq_mask, bits_g, n_pairs
    )

    @pl.when(has0)
    def _():
        _start_pair(tri_hbm, tribuf, sem, 0, g0a, g0b)

    def cond(st):
        return st[0]

    def body(st):
        _, p, slot, ga, gb, chk, best_t, best_id, best_u, best_v = st
        # read + prefetch the NEXT pair into the other slot
        has_next, na, nb, ka_next = _sched_pair(
            sbuf, p + 1, vq_shift, vq_mask, bits_g, n_pairs
        )

        @pl.when(has_next)
        def _():
            _start_pair(tri_hbm, tribuf, sem, 1 - slot, na, nb)

        _wait_pair(tri_hbm, tribuf, sem, slot, ga, gb)
        t, u, vv, ok, tri_id = _mt_wave(tribuf.at[slot], o, d, t_lo, 1e-5)
        accept = (
            ok & (t >= t_lo) & (t < t_hi) & (t <= best_t)
            & (u >= 0) & (vv >= 0) & (1.0 - u - vv >= 0)
        )
        t_cand = jnp.where(accept, t, F32_MAX)
        row_t = jnp.min(t_cand, axis=1)[:, None]
        row_id = jnp.min(
            jnp.where(t_cand <= row_t, tri_id, ID_MISS), axis=1
        )[:, None]
        msel = (t_cand <= row_t) & (tri_id == row_id)
        row_u = jnp.max(jnp.where(msel, u, -F32_MAX), axis=1)[:, None]
        row_v = jnp.max(jnp.where(msel, vv, -F32_MAX), axis=1)[:, None]
        better = (row_t < best_t) | ((row_t == best_t) & (row_id < best_id))
        better = better & (row_t < F32_MAX)
        best_t = jnp.where(better, row_t, best_t)
        best_id = jnp.where(better, row_id, best_id)
        best_u = jnp.where(better, row_u, best_u)
        best_v = jnp.where(better, row_v, best_v)

        # amortized front-to-back early exit: the schedule is sorted by
        # entry lower bound, so once the NEXT entry's bound >= every ray's
        # best_t nothing later can improve. f32 >= 0 bits are monotone ->
        # compare in int space; the scalar-core reduction runs only every
        # CHECK_PERIOD pairs (inside pl.when), writing an SMEM flag.
        chk = chk - 1

        @pl.when(has_next & (chk == 0))
        def _():
            bt_bits = jax.lax.bitcast_convert_type(best_t, jnp.int32)
            mb = jnp.max(bt_bits)
            lb = (ka_next >> bits_g) << bits_g
            sflag[0] = jnp.where(lb >= mb, jnp.int32(0), jnp.int32(1))

        chk = jnp.where(chk == 0, jnp.int32(CHECK_PERIOD), chk)
        cont = has_next & (sflag[0] == 1)

        # drain the prefetch if we exit with it in flight
        @pl.when(has_next & ~cont)
        def _():
            _wait_pair(tri_hbm, tribuf, sem, 1 - slot, na, nb)

        return (cont, p + 1, 1 - slot, na, nb, chk,
                best_t, best_id, best_u, best_v)

    best_t = t_hi
    best_id = jnp.full((Rt, 1), ID_MISS, jnp.int32)
    zero = jnp.zeros((Rt, 1), jnp.float32)
    st = (has0, jnp.int32(0), jnp.int32(0), g0a, g0b,
          jnp.int32(CHECK_PERIOD), best_t, best_id, zero, zero)
    _, _, _, _, _, _, best_t, best_id, best_u, best_v = jax.lax.while_loop(
        cond, body, st
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
    sched_hbm, ray_ref, tri_hbm, out_hit,
    sbuf, tribuf, sflag, sem_s, sem, *, v, bits_g,
):
    vq = sbuf.shape[1]
    vq_shift = int(np.log2(vq))
    vq_mask = vq - 1

    i = pl.program_id(0)
    cps = pltpu.make_async_copy(sched_hbm.at[i], sbuf, sem_s)
    cps.start()

    rays = ray_ref[:]
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    t_lo = rays[:, 9][:, None]
    t_hi = rays[:, 10][:, None]
    Rt = rays.shape[0]

    cps.wait()
    sflag[0] = jnp.int32(1)
    n_pairs = v // 2
    has0, g0a, g0b, _ = _sched_pair(
        sbuf, jnp.int32(0), vq_shift, vq_mask, bits_g, n_pairs
    )

    @pl.when(has0)
    def _():
        _start_pair(tri_hbm, tribuf, sem, 0, g0a, g0b)

    def cond(st):
        return st[0]

    def body(st):
        _, p, slot, ga, gb, chk, found = st
        has_next, na, nb, _ = _sched_pair(
            sbuf, p + 1, vq_shift, vq_mask, bits_g, n_pairs
        )

        @pl.when(has_next)
        def _():
            _start_pair(tri_hbm, tribuf, sem, 1 - slot, na, nb)

        _wait_pair(tri_hbm, tribuf, sem, slot, ga, gb)
        t, u, vv, ok, _tid = _mt_wave(tribuf.at[slot], o, d, t_lo, 1e-6)
        accept = (
            ok & (t >= t_lo) & (t <= t_hi)
            & (u >= 0) & (u <= 1.0) & (vv >= 0) & (u + vv <= 1.0)
        )
        found = found | jnp.any(accept, axis=1)[:, None].astype(jnp.int32)

        # early exit when every (schedulable) ray is occluded. Padded and
        # masked rays have t_hi <= t_lo and can never be found: OR them in
        # so they don't block the all-found test.
        chk = chk - 1

        @pl.when(has_next & (chk == 0))
        def _():
            blocked = found | (t_hi <= t_lo).astype(jnp.int32)
            sflag[0] = jnp.where(jnp.min(blocked) == 1,
                                 jnp.int32(0), jnp.int32(1))

        chk = jnp.where(chk == 0, jnp.int32(CHECK_PERIOD), chk)
        cont = has_next & (sflag[0] == 1)

        @pl.when(has_next & ~cont)
        def _():
            _wait_pair(tri_hbm, tribuf, sem, 1 - slot, na, nb)

        return cont, p + 1, 1 - slot, na, nb, chk, found

    found0 = jnp.zeros((Rt, 1), jnp.int32)
    st = (has0, jnp.int32(0), jnp.int32(0), g0a, g0b,
          jnp.int32(CHECK_PERIOD), found0)
    _, _, _, _, _, _, found = jax.lax.while_loop(cond, body, st)
    W = out_hit.shape[1]
    out_hit[:] = jnp.broadcast_to(found, (Rt, W))


# ---------------------------------------------------------------------------
# Drivers
# ---------------------------------------------------------------------------


import os as _os

SCHED_V = int(_os.environ.get("MCPT_SCHED_V", str(DEFAULT_V)))
if SCHED_V < 512 or (SCHED_V & (SCHED_V - 1)) != 0:
    # power of two: the kernel indexes the [4, V/4] SMEM block with shifts
    raise ValueError(
        f"MCPT_SCHED_V={SCHED_V} must be a power of two >= 512"
    )


@functools.partial(jax.jit, static_argnames=("ray_tile", "v"))
def closest_hit_schedule_impl(
    ts: TreeletSet, org, dirn, t_min, t_max,
    ray_tile: int = DEFAULT_RAY_TILE, v: int = None,
):
    v = v or SCHED_V
    g_total = ts.blk_box.shape[0] * ts.blk_box.shape[2]
    bits_g = _bits_for(g_total)
    c = ts.c
    rays, R, Rp = _pack_rays(org, dirn, t_min, t_max, ray_tile)
    Rt = min(ray_tile, Rp)
    n_tiles = Rp // Rt
    sched, incomplete, n_live = build_schedule(ts, rays, Rt, v)
    tri_flat = ts.tri  # [G, 16, C]

    out_t, out_id, out_uv = pl.pallas_call(
        functools.partial(_closest_kernel, v=v, bits_g=bits_g),
        grid=(n_tiles,),
        out_shape=(
            jax.ShapeDtypeStruct((Rp, 128), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 128), jnp.int32),
            jax.ShapeDtypeStruct((Rp, 128), jnp.float32),
        ),
        in_specs=[
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
            pltpu.SMEM((4, v // 4), jnp.int32),
            pltpu.VMEM((2, 16, 2 * c), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(sched, rays, tri_flat)
    return (out_t[:R, 0], out_id[:R, 0], out_uv[:R, 0], out_uv[:R, 64],
            incomplete)


@functools.partial(jax.jit, static_argnames=("ray_tile", "v"))
def any_hit_schedule_impl(
    ts: TreeletSet, org, dirn, t_min, t_max,
    ray_tile: int = DEFAULT_RAY_TILE, v: int = None,
):
    v = v or SCHED_V
    g_total = ts.blk_box.shape[0] * ts.blk_box.shape[2]
    bits_g = _bits_for(g_total)
    c = ts.c
    rays, R, Rp = _pack_rays(org, dirn, t_min, t_max, ray_tile)
    Rt = min(ray_tile, Rp)
    n_tiles = Rp // Rt
    sched, incomplete, n_live = build_schedule(ts, rays, Rt, v)

    out = pl.pallas_call(
        functools.partial(_any_kernel, v=v, bits_g=bits_g),
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((Rp, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Rt, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (Rt, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((4, v // 4), jnp.int32),
            pltpu.VMEM((2, 16, 2 * c), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(sched, rays, ts.tri)
    return out[:R, 0] > 0, incomplete


def _expand_tile_flag(flag, rt, r):
    """[n_tiles] bool -> [R] bool (per ray of the padded batch, sliced)."""
    return jnp.repeat(flag, rt)[:r]


@functools.partial(jax.jit, static_argnames=("ray_tile", "v"))
def _closest_sorted_sched(ts, org, dirn, t_min, t_max, ray_tile, v):
    from mcpt_tpu.ops.pallas.traverse import closest_hit_treelets_impl

    order = _ray_sort_order(ts, org, dirn)
    tM = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (org.shape[0],))
    o_s, d_s, tM_s = org[order], dirn[order], tM[order]
    t_s, tri_s, u_s, v_s, incomplete = closest_hit_schedule_impl(
        ts, o_s, d_s, t_min, tM_s, ray_tile=ray_tile, v=v
    )
    R = org.shape[0]
    inc_ray = _expand_tile_flag(incomplete, ray_tile, R)

    def cleanup(args):
        t_s, tri_s, u_s, v_s = args
        # exact voted-kernel pass over ONLY the truncated tiles' rays
        # (other rays get t_max = 0 -> no slab keys -> prologue exit)
        tM_fb = jnp.where(inc_ray, tM_s, 0.0)
        t2, tri2, u2, v2 = closest_hit_treelets_impl(
            ts, o_s, d_s, t_min, tM_fb, ray_tile=ray_tile
        )
        return (
            jnp.where(inc_ray, t2, t_s),
            jnp.where(inc_ray, tri2, tri_s),
            jnp.where(inc_ray, u2, u_s),
            jnp.where(inc_ray, v2, v_s),
        )

    t_s, tri_s, u_s, v_s = jax.lax.cond(
        jnp.any(incomplete), cleanup, lambda a: a, (t_s, tri_s, u_s, v_s)
    )
    t = jnp.zeros_like(t_s).at[order].set(t_s)
    tri = jnp.zeros_like(tri_s).at[order].set(tri_s)
    u = jnp.zeros_like(u_s).at[order].set(u_s)
    vv = jnp.zeros_like(v_s).at[order].set(v_s)
    return t, tri, u, vv


@functools.partial(jax.jit, static_argnames=("ray_tile", "v"))
def _any_sorted_sched(ts, org, dirn, t_min, t_max, ray_tile, v):
    from mcpt_tpu.ops.pallas.traverse import any_hit_treelets_impl

    order = _ray_sort_order(ts, org, dirn)
    tM = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (org.shape[0],))
    o_s, d_s, tM_s = org[order], dirn[order], tM[order]
    hit_s, incomplete = any_hit_schedule_impl(
        ts, o_s, d_s, t_min, tM_s, ray_tile=ray_tile, v=v
    )
    R = org.shape[0]
    inc_ray = _expand_tile_flag(incomplete, ray_tile, R)

    def cleanup(h):
        tM_fb = jnp.where(inc_ray, tM_s, 0.0)
        h2 = any_hit_treelets_impl(ts, o_s, d_s, t_min, tM_fb,
                                   ray_tile=ray_tile)
        return jnp.where(inc_ray, h2, h)

    hit_s = jax.lax.cond(jnp.any(incomplete), cleanup, lambda h: h, hit_s)
    return jnp.zeros_like(hit_s).at[order].set(hit_s)


def closest_hit_schedule(
    scene, org, dirn, t_min=1e-4, t_max=F32_MAX,
    ray_tile: int = DEFAULT_RAY_TILE, v: int = None,
):
    """Hit record via the schedule-fed kernel (TPU only; see dispatch)."""
    from mcpt_tpu.ops.intersect import Hit

    v = v or SCHED_V
    t, tri, u, vv = _closest_sorted_sched(
        scene.treelets, org, dirn, t_min, t_max, ray_tile, v
    )
    return Hit(t=t, tri=tri, u=u, v=vv)


def any_hit_schedule(
    scene, org, dirn, t_min=1e-4, t_max=F32_MAX,
    ray_tile: int = DEFAULT_RAY_TILE, v: int = None,
):
    v = v or SCHED_V
    return _any_sorted_sched(
        scene.treelets, org, dirn, t_min, t_max, ray_tile, v
    )
