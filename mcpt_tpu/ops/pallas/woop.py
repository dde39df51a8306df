"""Fused VMEM Woop intersection kernel: the mid-scene (veach-class) path.

The XLA dense Woop path (ops/intersect.closest_hit_woop) materializes the
projected coordinates P = A @ B as an [R, T, 6] HBM array — ~400 MB per
32k x 512-triangle scan step — and round-trips it through HBM into the
epilogue. Profiling one veach-mis wavefront iteration (round 4,
tools/profile_pass.py) put 95% of device time in those scan steps:
closest 2.76 ms + any-hit 2.71 ms per iteration against a ~0.3 ms shell.

This kernel runs the SAME algebra (ops/intersect._woop_tables /
_woop_tuv — reference accept predicate, src/Triangle.cpp:48-106) but keeps
everything in VMEM and CULLS whole triangle chunks per ray tile:

  * triangles are in BVH order (ops/bvh.py preorder), so a contiguous
    128-triangle chunk is spatially coherent and carries a tight AABB;
  * wavefront lanes are bound to pixels (integrator.trace_wavefront), so
    a 128-ray tile is image-coherent and its rays agree on which chunks
    matter — the reference's per-ray BVH pruning (src/BVH.cpp:95-113)
    reappears as per-TILE chunk skipping under pl.when;
  * live chunks run one MXU matmul [Rt, 8] @ [8, 6C] (HIGHEST precision:
    default f32 matmul truncates to bf16, far too coarse for the hard
    accept thresholds) and a short VPU epilogue, all in VMEM; only the
    [Rt] winner (t, id, u, v) leaves the kernel.

Emitting the winner's (u, v) lets the integrator use the slim 17-column
shading expansion (integrator.expand_hit_uv) on this path, like the
treelet kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32_MAX = np.float32(np.finfo(np.float32).max)
ID_MISS = np.int32(2**30)

import os as _os

# Experiment knob: cap the kernel's declared VMEM budget (bytes). The
# fusion-inflation hypothesis says XLA reserves scoped VMEM for the
# custom call and evicts its loop-carry pinning; a small declared cap
# may restore it.
_VMEM_CAP = int(_os.environ.get("MCPT_WOOP_VMEM_CAP", "0")) or None
_COMPILER_PARAMS = (
    pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP) if _VMEM_CAP else None
)

# Rays per kernel tile. Swept on veach-mis e2e (round 5): 128/256/512 ->
# 7.5/7.7/7.8 Mrays/s (fewer tiles amortize the per-tile fixed costs once
# chunk culling is coarse); 1024 exceeds the 16 MB scoped-VMEM limit.
DEFAULT_RAY_TILE = int(_os.environ.get("MCPT_WOOP_TILE", "512"))
# Triangles per cullable chunk (also the culling granularity). Swept on
# veach-mis 1024^2 e2e (round 5): C=64/128/256/512/768 -> 3.6/6.6/6.9/
# 7.5/7.6 Mrays/s — per-chunk fixed costs (mask read, pl.when boundary,
# matmul launch, epilogue) dominate the culling gains at mid-scene sizes,
# so the default targets ~3 chunks per scene (clamped to [128, 1024] and
# a 64 multiple for clean VMEM slicing). MCPT_WOOP_CHUNK forces a value.
_CHUNK_ENV = int(_os.environ.get("MCPT_WOOP_CHUNK", "0"))


def _auto_chunk(n_tris: int) -> int:
    if _CHUNK_ENV:
        return _CHUNK_ENV
    c = -(-n_tris // (3 * 128)) * 128  # 128-multiples slice/pack cleanly
    return max(128, min(1024, c))


CHUNK_T = _CHUNK_ENV or 128  # legacy constant (pack_woop_table default)


from dataclasses import dataclass


@dataclass(frozen=True)
class WoopSet:
    """Precomputed kernel tables (see pack_woop_table). Stored on the
    Scene so the packing runs once, not once per wavefront iteration
    (XLA does not hoist it out of the while body — measured ~4.5 ms of
    loop-invariant fusions per iteration on veach-mis). The two eps rows
    differ only by the closest/any determinant epsilon (1e-5 vs 1e-6,
    src/Triangle.cpp:54,85); tbl and boxes are shared."""

    tbl: jnp.ndarray  # f32[8, n_chunks*6*chunk]
    eps_closest: jnp.ndarray  # f32[8, Tp]
    eps_any: jnp.ndarray  # f32[8, Tp]
    boxes: jnp.ndarray  # f32[8, Cp]
    chunk: int = CHUNK_T  # static: triangles per cullable chunk


jax.tree_util.register_dataclass(
    WoopSet, data_fields=["tbl", "eps_closest", "eps_any", "boxes"],
    meta_fields=["chunk"],
)


def build_woop_set(v0, e1, e2) -> WoopSet:
    from mcpt_tpu.ops.intersect import DET_EPS_ANY, DET_EPS_CLOSEST

    chunk = _auto_chunk(int(v0.shape[0]))
    tbl, eps_c, boxes, _ = pack_woop_table(v0, e1, e2, DET_EPS_CLOSEST,
                                           chunk=chunk)
    _, eps_a, _, _ = pack_woop_table(v0, e1, e2, DET_EPS_ANY, chunk=chunk)
    return WoopSet(tbl=tbl, eps_closest=eps_c, eps_any=eps_a, boxes=boxes,
                   chunk=chunk)


def pack_woop_table(v0, e1, e2, det_eps, chunk: int = CHUNK_T):
    """Geometry -> (tbl [8, n_chunks*6*chunk], eps [8, Tp], boxes [8, Cp]).

    tbl layout is chunk-major then component-major: chunk c occupies
    columns [c*6*chunk, (c+1)*6*chunk), inside which component k occupies
    [k*chunk, (k+1)*chunk) — the kernel slices one contiguous block per
    chunk and unit-stride component views of the matmul result. Pad
    triangles carry eps = +inf (can never accept) and an inverted box.
    boxes rows: lo.xyz hi.xyz valid pad, one column per chunk (padded to
    a 128 multiple).
    """
    from mcpt_tpu.ops.intersect import _woop_tables

    T = v0.shape[0]
    n_chunks = max(1, -(-T // chunk))
    Tp = n_chunks * chunk
    pad = Tp - T
    v0p = jnp.pad(v0, ((0, pad), (0, 0)))
    e1p = jnp.pad(e1, ((0, pad), (0, 0)))
    e2p = jnp.pad(e2, ((0, pad), (0, 0)))
    blk, eps = _woop_tables(v0p, e1p, e2p, det_eps)
    # [Tp,6,8] -> [n_chunks, chunk, 6, 8] -> [8, n_chunks, 6, chunk]
    t4 = blk.reshape(n_chunks, chunk, 6, 8).transpose(3, 0, 2, 1)
    tbl = t4.reshape(8, n_chunks * 6 * chunk)
    epsr = jnp.broadcast_to(eps.reshape(1, Tp), (8, Tp))

    # chunk AABBs (pad triangles are all-zero points; exclude them via
    # the valid mask so the pad chunk's box stays inverted)
    p0, p1, p2 = v0p, v0p + e1p, v0p + e2p
    valid = (jnp.arange(Tp) < T)[:, None]
    big = jnp.float32(F32_MAX)
    lo3 = jnp.minimum(jnp.minimum(p0, p1), p2)
    hi3 = jnp.maximum(jnp.maximum(p0, p1), p2)
    lo3 = jnp.where(valid, lo3, big).reshape(n_chunks, chunk, 3).min(axis=1)
    hi3 = jnp.where(valid, hi3, -big).reshape(n_chunks, chunk, 3).max(axis=1)
    Cp = max(128, -(-n_chunks // 128) * 128)
    boxes = jnp.zeros((8, Cp), jnp.float32)
    boxes = boxes.at[0:3, :].set(big)
    boxes = boxes.at[3:6, :].set(-big)
    boxes = boxes.at[0:3, :n_chunks].set(lo3.T)
    boxes = boxes.at[3:6, :n_chunks].set(hi3.T)
    boxes = boxes.at[6, :n_chunks].set(1.0)
    return tbl, epsr, boxes, n_chunks


def _project(A, tbl_ref, c, chunk):
    """One chunk's [Rt, 6*chunk] projection on the MXU (HIGHEST f32)."""
    B = tbl_ref[:, c * 6 * chunk:(c + 1) * 6 * chunk]
    return jax.lax.dot_general(
        A, B, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _tuv(P, eps_ref, c, chunk):
    ox = P[:, 0 * chunk:1 * chunk]
    oy = P[:, 1 * chunk:2 * chunk]
    oz = P[:, 2 * chunk:3 * chunk]
    dx = P[:, 3 * chunk:4 * chunk]
    dy = P[:, 4 * chunk:5 * chunk]
    dz = P[:, 5 * chunk:6 * chunk]
    eps = eps_ref[0, c * chunk:(c + 1) * chunk][None, :]
    ok = jnp.abs(dz) >= eps
    inv = jnp.where(ok, 1.0 / jnp.where(ok, dz, 1.0), 0.0)
    t = -oz * inv
    u = ox + t * dx
    v = oy + t * dy
    return t, u, v, ok


def _closest_kernel(
    mask_ref, eps_ref, tbl_ref, ray_ref, out_t,
    acc_t, acc_id, acc_u, acc_v, *, n_chunks, chunk,
):
    rays = ray_ref[:]
    A = rays[:, 0:8]  # (o.xyz, 1, d.xyz, 0) — the Woop projection input
    t_lo = rays[:, 8][:, None]
    t_hi = rays[:, 9][:, None]
    Rt = rays.shape[0]

    # Per-tile chunk-live BITMASK, precomputed by the XLA pre-pass
    # (_tile_chunk_mask) and read from whole-array SMEM: the round-4
    # version reduced a per-ray [Rt, Cp] slab wave to ONE SCALAR PER CHUNK
    # in-kernel (`pl.when(jnp.any(live[:, c]))`) — up to 32 vector->scalar
    # round trips (~1 us each) per tile, the same atom that bounds the
    # treelet vote. SMEM bit reads cost ~ns.
    m = mask_ref[pl.program_id(0)]

    # accumulators live in scratch refs so pl.when bodies can update them
    acc_t[:] = jnp.broadcast_to(t_hi, (Rt, 1))
    acc_id[:] = jnp.full((Rt, 1), ID_MISS, jnp.int32)
    acc_u[:] = jnp.zeros((Rt, 1), jnp.float32)
    acc_v[:] = jnp.zeros((Rt, 1), jnp.float32)

    for c in range(n_chunks):  # static unroll; dead chunks skipped at run
        @pl.when((m >> c) & 1 != 0)
        def _(c=c):
            best_t = acc_t[:]
            P = _project(A, tbl_ref, c, chunk)
            t, u, v, ok = _tuv(P, eps_ref, c, chunk)
            accept = (
                ok & (t >= t_lo) & (t < t_hi) & (t <= best_t)
                & (u >= 0) & (v >= 0) & (1.0 - u - v >= 0)
            )
            t_cand = jnp.where(accept, t, F32_MAX)
            row_t = jnp.min(t_cand, axis=1)[:, None]
            ids = (c * chunk
                   + jax.lax.broadcasted_iota(jnp.int32, t_cand.shape, 1))
            row_id = jnp.min(
                jnp.where(t_cand <= row_t, ids, ID_MISS), axis=1
            )[:, None]
            msel = (t_cand <= row_t) & (ids == row_id)
            row_u = jnp.max(jnp.where(msel, u, -F32_MAX), axis=1)[:, None]
            row_v = jnp.max(jnp.where(msel, v, -F32_MAX), axis=1)[:, None]
            # chunks run in ascending-id order, so on a t tie the earlier
            # chunk (lower id) must win: strict < against the accumulator
            # (in-chunk ties already resolved to the lowest id above)
            better = (row_t < best_t) & (row_t < F32_MAX)
            acc_t[:] = jnp.where(better, row_t, best_t)
            acc_id[:] = jnp.where(better, row_id, acc_id[:])
            acc_u[:] = jnp.where(better, row_u, acc_u[:])
            acc_v[:] = jnp.where(better, row_v, acc_v[:])

    best_t = acc_t[:]
    best_id = acc_id[:]
    hit = best_id < ID_MISS
    # ONE packed output buffer (t | id | u | v in 32-column bands): three
    # separate [Rp,128] outputs tripled the call's HBM output footprint
    # (probe for the fusion-inflation effect: less buffer pressure)
    W = out_t.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (Rt, W), 1)
    t_b = jnp.broadcast_to(jnp.where(hit, best_t, F32_MAX), (Rt, W))
    id_b = jax.lax.bitcast_convert_type(
        jnp.broadcast_to(jnp.where(hit, best_id, -1), (Rt, W)), jnp.float32
    )
    u_b = jnp.broadcast_to(jnp.where(hit, acc_u[:], 0.0), (Rt, W))
    v_b = jnp.broadcast_to(jnp.where(hit, acc_v[:], 0.0), (Rt, W))
    out_t[:] = jnp.where(
        col < 32, t_b, jnp.where(col < 64, id_b, jnp.where(col < 96, u_b, v_b))
    )


def _any_kernel(
    mask_ref, eps_ref, tbl_ref, ray_ref, out_hit, acc_f,
    *, n_chunks, chunk,
):
    rays = ray_ref[:]
    A = rays[:, 0:8]
    t_lo = rays[:, 8][:, None]
    t_hi = rays[:, 9][:, None]
    Rt = rays.shape[0]

    m = mask_ref[pl.program_id(0)]  # see _closest_kernel
    acc_f[:] = jnp.zeros((Rt, 1), jnp.int32)

    for c in range(n_chunks):
        @pl.when((m >> c) & 1 != 0)
        def _(c=c):
            P = _project(A, tbl_ref, c, chunk)
            t, u, v, ok = _tuv(P, eps_ref, c, chunk)
            accept = (
                ok
                & (u >= 0) & (u <= 1.0)
                & (v >= 0) & (u + v <= 1.0)
                & (t >= t_lo) & (t <= t_hi)  # inclusive (Triangle.cpp:94-103)
            )
            acc_f[:] = acc_f[:] | jnp.any(accept, axis=1)[:, None].astype(
                jnp.int32
            )

    W = out_hit.shape[1]
    out_hit[:] = jnp.broadcast_to(acc_f[:], (Rt, W))


def _tile_chunk_mask(rays, boxes, n_chunks, rt):
    """Per-tile chunk-live bitmask i32[n_tiles] (XLA pre-pass).

    Conservative bundle test (interval-arithmetic slab, shared with the
    schedule pre-pass): bit c is set unless NO ray in the tile can hit
    chunk c's AABB inside its [t_lo, t_hi). Parked lanes (|o| >= 1e29,
    the integrator's dead-lane trick) and masked rays (t_hi <= t_lo) are
    excluded from the bundle; an all-dead tile gets mask 0 and the kernel
    writes misses without touching the MXU.
    """
    from mcpt_tpu.ops.pallas.schedule import _interval_slab

    n_tiles = rays.shape[0] // rt
    o = rays[:, 0:3].reshape(n_tiles, rt, 3)
    d = rays[:, 4:7].reshape(n_tiles, rt, 3)
    t_lo = rays[:, 8].reshape(n_tiles, rt)
    t_hi = rays[:, 9].reshape(n_tiles, rt)
    valid = (t_lo < t_hi) & (jnp.max(jnp.abs(o), axis=-1) < 1e29)
    v3 = valid[..., None]
    olo = jnp.min(jnp.where(v3, o, jnp.inf), axis=1)
    ohi = jnp.max(jnp.where(v3, o, -jnp.inf), axis=1)
    dlo = jnp.min(jnp.where(v3, d, jnp.inf), axis=1)
    dhi = jnp.max(jnp.where(v3, d, -jnp.inf), axis=1)
    tlo = jnp.min(jnp.where(valid, t_lo, jnp.inf), axis=1)
    thi = jnp.max(jnp.where(valid, t_hi, -jnp.inf), axis=1)
    blo = boxes[0:3, :n_chunks].T
    bhi = boxes[3:6, :n_chunks].T
    valid_box = boxes[6, :n_chunks] > 0.0
    hit, _ = _interval_slab(olo, ohi, dlo, dhi, tlo, thi, blo, bhi, valid_box)
    bits = hit.astype(jnp.int32) << jnp.arange(n_chunks, dtype=jnp.int32)[None, :]
    # disjoint powers of two: sum == bitwise OR (incl. the sign bit at 31)
    return jnp.sum(bits, axis=1)


def _pack_rays(org, dirn, t_min, t_max, Rt):
    R = org.shape[0]
    t_lo = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_hi = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    rays = jnp.concatenate(
        [
            org.astype(jnp.float32),
            jnp.ones((R, 1), jnp.float32),
            dirn.astype(jnp.float32),
            jnp.zeros((R, 1), jnp.float32),
            t_lo[:, None],
            t_hi[:, None],
            (1.0 / dirn).astype(jnp.float32),
            jnp.zeros((R, 3), jnp.float32),
        ],
        axis=1,
    )  # [R, 16]: A(0:8) t_lo(8) t_hi(9) inv_d(10:13)
    Rp = -(-R // Rt) * Rt
    if Rp != R:
        pad = jnp.zeros((Rp - R, 16), jnp.float32)
        pad = pad.at[:, 4:7].set(1.0)  # benign direction; t_hi = 0
        pad = pad.at[:, 10:13].set(1.0)
        rays = jnp.concatenate([rays, pad], axis=0)
    return rays, R, Rp


@functools.partial(
    jax.jit, static_argnames=("ray_tile", "interpret", "chunk")
)
def closest_hit_woop_fused_impl(
    tbl, epsr, boxes, org, dirn, t_min, t_max,
    ray_tile: int = DEFAULT_RAY_TILE, interpret: bool = False,
    chunk: int = CHUNK_T,
):
    n_chunks = tbl.shape[1] // (6 * chunk)  # static (from shape)
    assert n_chunks <= 32, "dense path caps at 4096 tris = 32 chunk bits"
    rays, R, Rp = _pack_rays(org, dirn, t_min, t_max, ray_tile)
    Rt = min(ray_tile, Rp)
    n_tiles = Rp // Rt
    mask = _tile_chunk_mask(rays, boxes, n_chunks, Rt)
    out = pl.pallas_call(
        functools.partial(_closest_kernel, n_chunks=n_chunks, chunk=chunk),
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((Rp, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec((n_tiles,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, epsr.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tbl.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rt, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (Rt, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((Rt, 1), jnp.float32),
            pltpu.VMEM((Rt, 1), jnp.int32),
            pltpu.VMEM((Rt, 1), jnp.float32),
            pltpu.VMEM((Rt, 1), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(mask, epsr, tbl, rays)
    t = out[:R, 0]
    tri = jax.lax.bitcast_convert_type(out[:R, 32], jnp.int32)
    return t, tri, out[:R, 64], out[:R, 96]


@functools.partial(
    jax.jit, static_argnames=("ray_tile", "interpret", "chunk")
)
def any_hit_woop_fused_impl(
    tbl, epsr, boxes, org, dirn, t_min, t_max,
    ray_tile: int = DEFAULT_RAY_TILE, interpret: bool = False,
    chunk: int = CHUNK_T,
):
    n_chunks = tbl.shape[1] // (6 * chunk)  # static (from shape)
    assert n_chunks <= 32, "dense path caps at 4096 tris = 32 chunk bits"
    rays, R, Rp = _pack_rays(org, dirn, t_min, t_max, ray_tile)
    Rt = min(ray_tile, Rp)
    n_tiles = Rp // Rt
    mask = _tile_chunk_mask(rays, boxes, n_chunks, Rt)
    out = pl.pallas_call(
        functools.partial(_any_kernel, n_chunks=n_chunks, chunk=chunk),
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((Rp, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec((n_tiles,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, epsr.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tbl.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rt, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (Rt, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((Rt, 1), jnp.int32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(mask, epsr, tbl, rays)
    return out[:R, 0] > 0


def _default_interpret() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return True


def closest_hit_woop_fused(scene, org, dirn, t_min=1e-4, t_max=F32_MAX,
                           ray_tile: int = DEFAULT_RAY_TILE,
                           interpret: bool = None):
    """Hit (with kernel u/v) via the fused VMEM Woop kernel."""
    from mcpt_tpu.ops.intersect import DET_EPS_CLOSEST, Hit

    if interpret is None:
        interpret = _default_interpret()
    ws = getattr(scene, "woop", None)
    if ws is not None:
        tbl, epsr, boxes, chunk = ws.tbl, ws.eps_closest, ws.boxes, ws.chunk
    else:
        # fallback (tests / ad-hoc scenes): pack in-trace. Selection is
        # frozen under AD (dispatch contract): tables must be detached or
        # grad would need a VJP through the Pallas kernel.
        g = scene.geom
        sg = jax.lax.stop_gradient
        chunk = _auto_chunk(int(g.v0.shape[0]))
        tbl, epsr, boxes, _ = pack_woop_table(
            sg(g.v0), sg(g.e1), sg(g.e2), DET_EPS_CLOSEST, chunk=chunk
        )
    t, tri, u, v = closest_hit_woop_fused_impl(
        tbl, epsr, boxes, org, dirn, t_min, t_max,
        ray_tile=ray_tile, interpret=interpret, chunk=chunk,
    )
    return Hit(t=t, tri=tri, u=u, v=v)


def any_hit_woop_fused(scene, org, dirn, t_min=1e-4, t_max=F32_MAX,
                       ray_tile: int = DEFAULT_RAY_TILE,
                       interpret: bool = None):
    from mcpt_tpu.ops.intersect import DET_EPS_ANY

    if interpret is None:
        interpret = _default_interpret()
    ws = getattr(scene, "woop", None)
    if ws is not None:
        tbl, epsr, boxes, chunk = ws.tbl, ws.eps_any, ws.boxes, ws.chunk
    else:
        g = scene.geom
        sg = jax.lax.stop_gradient
        chunk = _auto_chunk(int(g.v0.shape[0]))
        tbl, epsr, boxes, _ = pack_woop_table(
            sg(g.v0), sg(g.e1), sg(g.e2), DET_EPS_ANY, chunk=chunk
        )
    return any_hit_woop_fused_impl(
        tbl, epsr, boxes, org, dirn, t_min, t_max,
        ray_tile=ray_tile, interpret=interpret, chunk=chunk,
    )
