"""Batched ray-triangle intersection (Moller-Trumbore) for TPU.

The reference tests one ray against one triangle at a time behind virtual
calls (src/Triangle.cpp:48-106); here rays are a flat [R] batch and triangles
an SoA block, so each step is a [R, C] vectorized VPU computation with a
running-min reduction — no recursion, no branches.

Epsilon parity with the reference:
  * closest-hit: |det| < 1e-5 rejects (Triangle.cpp:54), accept
    t in [t_min, t_max) with u>=0, v>=0, 1-u-v>=0 (Triangle.cpp:66)
  * any-hit: |det| < 1e-6 rejects (Triangle.cpp:85), accept t in
    [t_min, t_max] with u in [0,1], v>=0, u+v<=1 (Triangle.cpp:94-103)
  * default ray interval t1=1e-4, t2=inf (Render.h:30)
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from mcpt_tpu.scene import Geometry, Scene
from mcpt_tpu.utils.math import cross, dot

T_MIN = 1e-4  # reference Ray::t1 (src/Render.h:30)
F32_MAX = jnp.finfo(jnp.float32).max
DET_EPS_CLOSEST = 1e-5
DET_EPS_ANY = 1e-6

# Brute-force triangle chunk: one [R, CHUNK] wave per scan step.
DEFAULT_CHUNK = 512


@dataclass(frozen=True)
class Hit:
    """Closest-hit record for a ray batch. tri == -1 means miss.

    The dense XLA paths carry only (t, tri): barycentrics are recomputed
    at shading time from the gathered triangle row (integrator.expand_hit)
    because selecting per-ray u/v out of the [R, C] candidate wave needs
    dynamic row gathers, which break XLA fusion on TPU and cost ~60x the
    fully fused intersection kernel. The Pallas treelet traversal instead
    SELECTS the winner's u/v in-kernel (mask + reduction, ~+10%/visit) and
    returns them, which lets the integrator skip gathering v0/e1/e2 per
    hit — on a 1M-triangle scene that gather costs as much as traversal.
    """

    t: jnp.ndarray  # f32[R]
    tri: jnp.ndarray  # i32[R]
    u: jnp.ndarray = None  # f32[R] barycentric, treelet path only
    v: jnp.ndarray = None  # f32[R]

    @property
    def valid(self) -> jnp.ndarray:
        return self.tri >= 0


jax.tree_util.register_dataclass(
    Hit, data_fields=["t", "tri", "u", "v"], meta_fields=[]
)

_IDX_BIG = jnp.int32(2**30)


def _min_and_first_index(t_cand: jnp.ndarray, base_idx: jnp.ndarray, axis: int):
    """(min t, index of the first minimum) via two fused reductions.

    Equivalent to argmin + gather but stays inside one XLA fusion: no
    dynamic per-row gathers. `base_idx` broadcasts against t_cand and
    gives each candidate its global triangle id.
    """
    tbest = jnp.min(t_cand, axis=axis)
    sel = t_cand <= jnp.expand_dims(tbest, axis)
    idx = jnp.min(jnp.where(sel, base_idx, _IDX_BIG), axis=axis)
    return tbest, idx


def _mt_candidates(v0, e1, e2, org, dirn, det_eps, f64: bool = False):
    """Moller-Trumbore for rays [R,3] x tris [C,3] -> t,u,v,det each [R,C].

    Broadcast layout: rays on axis 0, triangles on axis 1. `f64=True`
    evaluates the WHOLE predicate in double precision (the reference
    traces geometry in double, src/utils.h:5-18) — the escape hatch for
    scenes where f32 slab/MT rounding flips a grazing accept. Requires
    jax_enable_x64; only the dense `mt` dispatch offers it
    (MCPT_F64_GEOM=1), as a verification path, not a fast path.
    """
    if f64:
        import jax

        if not jax.config.jax_enable_x64:
            raise RuntimeError(
                "f64 geometry requested but jax_enable_x64 is off; set "
                "JAX_ENABLE_X64=1 (or jax.config.update) first"
            )
        v0, e1, e2 = (x.astype(jnp.float64) for x in (v0, e1, e2))
        org, dirn = org.astype(jnp.float64), dirn.astype(jnp.float64)
    o = org[:, None, :]  # [R,1,3]
    d = dirn[:, None, :]
    tv0 = v0[None, :, :]  # [1,C,3]
    te1 = e1[None, :, :]
    te2 = e2[None, :, :]

    h = cross(d, te2)  # [R,C,3]
    det = dot(te1, h)  # [R,C]
    s = o - tv0
    u = dot(s, h)
    q = cross(s, te1)
    v = dot(d, q)
    t = dot(te2, q)
    inv = jnp.where(jnp.abs(det) < det_eps, 0.0, 1.0 / det)
    return t * inv, u * inv, v * inv, jnp.abs(det) >= det_eps


def _closest_over_block(v0, e1, e2, tri_base, org, dirn, t_min, t_max,
                        tri_valid=None, f64: bool = False):
    """Closest hit of each ray against one triangle block.

    Returns per-ray (t, global_tri_index_or_-1); t = +inf on miss.
    `t_max` is the *exclusive* upper bound per ray ([R] or scalar).
    Fully fused: min-reductions only, no dynamic gathers (see Hit).
    """
    t, u, v, ok = _mt_candidates(v0, e1, e2, org, dirn, DET_EPS_CLOSEST,
                                 f64=f64)
    tm = jnp.asarray(t_min)
    tM = jnp.asarray(t_max)
    if tM.ndim == 1:
        tM = tM[:, None]
    if tm.ndim == 1:
        tm = tm[:, None]
    accept = ok & (t >= tm) & (t < tM) & (u >= 0) & (v >= 0) & (1.0 - u - v >= 0)
    if tri_valid is not None:
        accept = accept & tri_valid[None, :]
    t_cand = jnp.where(accept, t, F32_MAX)
    C = t_cand.shape[1]
    base = tri_base + jnp.arange(C, dtype=jnp.int32)[None, :]
    best_t, idx = _min_and_first_index(t_cand, base, axis=1)
    return (best_t.astype(jnp.float32),
            jnp.where(best_t < F32_MAX, idx, -1))


def _any_over_block(v0, e1, e2, org, dirn, t_min, t_max, tri_valid=None,
                    f64: bool = False):
    """Boolean any-hit of each ray against a block ([R] bool).

    Inclusive t interval, matching reference Triangle::isIntersect.
    """
    t, u, v, ok = _mt_candidates(v0, e1, e2, org, dirn, DET_EPS_ANY, f64=f64)
    tm = jnp.asarray(t_min)
    tM = jnp.asarray(t_max)
    if tM.ndim == 1:
        tM = tM[:, None]
    if tm.ndim == 1:
        tm = tm[:, None]
    accept = (
        ok
        & (u >= 0) & (u <= 1.0)
        & (v >= 0) & (u + v <= 1.0)
        & (t >= tm) & (t <= tM)
    )
    if tri_valid is not None:
        accept = accept & tri_valid[None, :]
    return jnp.any(accept, axis=1)


def _pad_tris(geom: Geometry, chunk: int):
    """Pad triangle arrays to a multiple of `chunk`; returns arrays + valid mask."""
    T = geom.v0.shape[0]
    Tp = max(chunk, ((T + chunk - 1) // chunk) * chunk)
    pad = Tp - T
    v0 = jnp.pad(geom.v0, ((0, pad), (0, 0)))
    e1 = jnp.pad(geom.e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(geom.e2, ((0, pad), (0, 0)))
    valid = jnp.arange(Tp) < T
    return v0, e1, e2, valid, Tp


def closest_hit_bruteforce(
    scene: Scene, org, dirn, t_min=T_MIN, t_max=F32_MAX,
    chunk: int = DEFAULT_CHUNK, f64: bool = False,
) -> Hit:
    """Intersect-all closest hit, tiled over triangle chunks with lax.scan.

    For small scenes (cornell/veach class) this is faster on TPU than any
    tree: zero divergence, pure VPU throughput. `f64=True` evaluates the
    accept predicate in double (see _mt_candidates).
    """
    geom = scene.geom
    T = geom.v0.shape[0]
    if T <= chunk:
        t, tri = _closest_over_block(
            geom.v0, geom.e1, geom.e2, 0, org, dirn, t_min, t_max, f64=f64
        )
        return Hit(t=t, tri=tri)

    v0, e1, e2, valid, Tp = _pad_tris(geom, chunk)
    n_chunks = Tp // chunk
    v0c = v0.reshape(n_chunks, chunk, 3)
    e1c = e1.reshape(n_chunks, chunk, 3)
    e2c = e2.reshape(n_chunks, chunk, 3)
    validc = valid.reshape(n_chunks, chunk)

    R = org.shape[0]
    init = (
        jnp.full((R,), F32_MAX),
        jnp.full((R,), -1, jnp.int32),
    )

    def body(carry, xs):
        bt, btri = carry
        cv0, ce1, ce2, cvalid, base = xs
        t, tri = _closest_over_block(
            cv0, ce1, ce2, base, org, dirn, t_min, t_max, tri_valid=cvalid,
            f64=f64,
        )
        better = t < bt
        return (
            jnp.where(better, t, bt),
            jnp.where(better, tri, btri),
        ), None

    bases = (jnp.arange(n_chunks) * chunk).astype(jnp.int32)
    (bt, btri), _ = jax.lax.scan(body, init, (v0c, e1c, e2c, validc, bases))
    return Hit(t=bt, tri=btri)


def any_hit_bruteforce(
    scene: Scene, org, dirn, t_min=T_MIN, t_max=F32_MAX,
    chunk: int = DEFAULT_CHUNK, f64: bool = False,
) -> jnp.ndarray:
    """Boolean occlusion test (shadow rays), tiled like closest_hit."""
    geom = scene.geom
    T = geom.v0.shape[0]
    if T <= chunk:
        return _any_over_block(geom.v0, geom.e1, geom.e2, org, dirn,
                               t_min, t_max, f64=f64)

    v0, e1, e2, valid, Tp = _pad_tris(geom, chunk)
    n_chunks = Tp // chunk
    v0c = v0.reshape(n_chunks, chunk, 3)
    e1c = e1.reshape(n_chunks, chunk, 3)
    e2c = e2.reshape(n_chunks, chunk, 3)
    validc = valid.reshape(n_chunks, chunk)

    def body(carry, xs):
        cv0, ce1, ce2, cvalid = xs
        hit = _any_over_block(cv0, ce1, ce2, org, dirn, t_min, t_max,
                              tri_valid=cvalid, f64=f64)
        return carry | hit, None

    init = jnp.zeros((org.shape[0],), bool)
    out, _ = jax.lax.scan(body, init, (v0c, e1c, e2c, validc))
    return out


# ---------------------------------------------------------------------------
# Woop-transform intersection: the same hit predicate as Moller-Trumbore,
# reformulated so the heavy inner product work runs on the MXU.
#
# Per triangle, precompute the affine map W x + p that carries the triangle
# to the unit triangle (v0 -> 0, e1 -> x, e2 -> y, n = e1 x e2 -> z). For a
# ray (o, d): o' = W o + p and d' = W d give
#     t = -o'_z / d'_z,  u = o'_x + t d'_x,  v = o'_y + t d'_y
# with the SAME accept set as Moller-Trumbore (u, v, t are algebraically
# identical; only f32 rounding differs). The reference's determinant test
# |e1.(d x e2)| >= eps (src/Triangle.cpp:54,85) maps exactly to
# |d'_z| >= eps / |n|^2 because det_MT = -d.n and d'_z = d.n / |n|^2.
#
# Both o' and d' for ALL triangles come from ONE [R,8] @ [8,6C] matmul, so
# ~75% of the intersection FLOPs move from the VPU (8x128) to the MXU
# (128x128 systolic); the per-(ray,tri) epilogue is ~15 VPU ops vs ~56 for
# direct Moller-Trumbore. Degenerate triangles (|n| = 0) get an infinite
# threshold and can never accept.
# ---------------------------------------------------------------------------


def _woop_tables(v0, e1, e2, det_eps):
    """Per-triangle [T,6,8] matmul block + [T] |d'_z| threshold."""
    n = cross(e1, e2)
    n2 = jnp.sum(n * n, axis=-1)  # det([e1 e2 n]) = |n|^2
    inv = jnp.where(n2 > 0, 1.0 / jnp.where(n2 > 0, n2, 1.0), 0.0)
    r1 = cross(e2, n) * inv[:, None]  # rows of W = [e1 e2 n]^-1
    r2 = cross(n, e1) * inv[:, None]
    r3 = n * inv[:, None]
    W = jnp.stack([r1, r2, r3], axis=1)  # [T,3,3]
    p = -jnp.einsum("tkj,tj->tk", W, v0)  # [T,3]
    T = v0.shape[0]
    blk = jnp.zeros((T, 6, 8), W.dtype)
    blk = blk.at[:, 0:3, 0:3].set(W)  # o' rows: W
    blk = blk.at[:, 0:3, 3].set(p)  # ... + p (homogeneous 1)
    blk = blk.at[:, 3:6, 4:7].set(W)  # d' rows: W
    eps = jnp.where(n2 > 0, det_eps * inv, F32_MAX)
    return blk, eps


def _woop_project(blk, org, dirn):
    """[R,T,6] = (o'_x o'_y o'_z d'_x d'_y d'_z) for all (ray, tri) pairs."""
    R = org.shape[0]
    T = blk.shape[0]
    A = jnp.concatenate(
        [org, jnp.ones((R, 1), org.dtype), dirn, jnp.zeros((R, 1), org.dtype)],
        axis=1,
    )  # [R,8]
    B = blk.reshape(T * 6, 8).T  # [8, 6T]
    # HIGHEST: TPU default f32 matmul truncates operands to bf16 (~8 mantissa
    # bits), far too coarse for the hard accept thresholds (t>=1e-4, u/v>=0);
    # HIGHEST runs the 6-pass decomposition at full f32 accuracy. K=8 makes
    # this matmul bandwidth-bound, so the extra passes are nearly free.
    P = jnp.dot(
        A, B, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )  # MXU
    return P.reshape(R, T, 6)


def _woop_tuv(P, eps):
    """t,u,v [R,T] + non-parallel mask from the projected coordinates."""
    dz = P[..., 5]
    ok = jnp.abs(dz) >= eps[None, :]
    inv_dz = jnp.where(ok, 1.0 / jnp.where(ok, dz, 1.0), 0.0)
    t = -P[..., 2] * inv_dz
    u = P[..., 0] + t * P[..., 3]
    v = P[..., 1] + t * P[..., 4]
    return t, u, v, ok


def _bounds(t_min, t_max):
    tm = jnp.asarray(t_min)
    tM = jnp.asarray(t_max)
    if tM.ndim == 1:
        tM = tM[:, None]
    if tm.ndim == 1:
        tm = tm[:, None]
    return tm, tM


def _closest_woop_block(blk, eps, tri_base, org, dirn, t_min, t_max, tri_valid=None):
    t, u, v, ok = _woop_tuv(_woop_project(blk, org, dirn), eps)
    tm, tM = _bounds(t_min, t_max)
    accept = ok & (t >= tm) & (t < tM) & (u >= 0) & (v >= 0) & (1.0 - u - v >= 0)
    if tri_valid is not None:
        accept = accept & tri_valid[None, :]
    t_cand = jnp.where(accept, t, F32_MAX)
    C = t_cand.shape[1]
    base = tri_base + jnp.arange(C, dtype=jnp.int32)[None, :]
    best_t, idx = _min_and_first_index(t_cand, base, axis=1)
    return best_t, jnp.where(best_t < F32_MAX, idx, -1)


def _any_woop_block(blk, eps, org, dirn, t_min, t_max, tri_valid=None):
    t, u, v, ok = _woop_tuv(_woop_project(blk, org, dirn), eps)
    tm, tM = _bounds(t_min, t_max)
    accept = (
        ok
        & (u >= 0) & (u <= 1.0)
        & (v >= 0) & (u + v <= 1.0)
        & (t >= tm) & (t <= tM)
    )
    if tri_valid is not None:
        accept = accept & tri_valid[None, :]
    return jnp.any(accept, axis=1)


def closest_hit_woop(
    scene: Scene, org, dirn, t_min=T_MIN, t_max=F32_MAX, chunk: int = DEFAULT_CHUNK
) -> Hit:
    """MXU-matmul closest hit (Woop transform), tiled over triangle chunks."""
    geom = scene.geom
    T = geom.v0.shape[0]
    if T <= chunk:
        blk, eps = _woop_tables(geom.v0, geom.e1, geom.e2, DET_EPS_CLOSEST)
        t, tri = _closest_woop_block(blk, eps, 0, org, dirn, t_min, t_max)
        return Hit(t=t, tri=tri)

    v0, e1, e2, valid, Tp = _pad_tris(geom, chunk)
    blk, eps = _woop_tables(v0, e1, e2, DET_EPS_CLOSEST)
    n_chunks = Tp // chunk
    blkc = blk.reshape(n_chunks, chunk, 6, 8)
    epsc = eps.reshape(n_chunks, chunk)
    validc = valid.reshape(n_chunks, chunk)
    R = org.shape[0]
    init = (jnp.full((R,), F32_MAX), jnp.full((R,), -1, jnp.int32))

    def body(carry, xs):
        bt, btri = carry
        cblk, ceps, cvalid, base = xs
        t, tri = _closest_woop_block(
            cblk, ceps, base, org, dirn, t_min, t_max, tri_valid=cvalid
        )
        better = t < bt
        return (jnp.where(better, t, bt), jnp.where(better, tri, btri)), None

    bases = (jnp.arange(n_chunks) * chunk).astype(jnp.int32)
    (bt, btri), _ = jax.lax.scan(body, init, (blkc, epsc, validc, bases))
    return Hit(t=bt, tri=btri)


def any_hit_woop(
    scene: Scene, org, dirn, t_min=T_MIN, t_max=F32_MAX, chunk: int = DEFAULT_CHUNK
) -> jnp.ndarray:
    """MXU-matmul any-hit (shadow rays), tiled over triangle chunks."""
    geom = scene.geom
    T = geom.v0.shape[0]
    if T <= chunk:
        blk, eps = _woop_tables(geom.v0, geom.e1, geom.e2, DET_EPS_ANY)
        return _any_woop_block(blk, eps, org, dirn, t_min, t_max)

    v0, e1, e2, valid, Tp = _pad_tris(geom, chunk)
    blk, eps = _woop_tables(v0, e1, e2, DET_EPS_ANY)
    n_chunks = Tp // chunk
    blkc = blk.reshape(n_chunks, chunk, 6, 8)
    epsc = eps.reshape(n_chunks, chunk)
    validc = valid.reshape(n_chunks, chunk)

    def body(carry, xs):
        cblk, ceps, cvalid = xs
        hit = _any_woop_block(cblk, ceps, org, dirn, t_min, t_max, tri_valid=cvalid)
        return carry | hit, None

    init = jnp.zeros((org.shape[0],), bool)
    out, _ = jax.lax.scan(body, init, (blkc, epsc, validc))
    return out


# Above this triangle count the dense intersect-everything wave loses to
# tree traversal even on TPU. Kept as the hard ceiling for the dense path
# (the [R, C] wave's cost is linear in T); the treelet kernel takes over
# far earlier on real TPUs — see TREELET_MIN_TRIS.
BRUTE_FORCE_MAX_TRIS = 4096

# On a real TPU the Pallas treelet megakernel beats the dense paths above
# this count. Measured on v5e (round 4, tools/bench_traverse.py --sweep,
# 32k scrambled rays): dense XLA Woop vs treelets per call — 1024 tris
# 8.8 vs 9.9 ms, 4096 tris 17.0 vs 17.1, 8192 tris 28.9 vs 26.0; and
# e2e a 972-tri render through treelets was 4x SLOWER per iteration
# (34.6 vs 5.8 ms/iter device: the per-call sort + scatter overhead
# dominates mid scenes). The mid-scene (veach) class is served by the
# fused VMEM Woop kernel (ops/pallas/woop.py) instead.
TREELET_MIN_TRIS = 4096


import os as _os

# Dense-path algorithm:
#   "auto"       (default) fused VMEM Pallas kernel on TPU for mid scenes
#                (DENSE_KERNEL_MIN_TRIS < T <= BRUTE_FORCE_MAX_TRIS) via
#                the pipelined split wavefront — measured 7.8 vs 6.6
#                Mrays/s e2e on veach (round 5); XLA Woop elsewhere
#   "woop"       force the XLA Woop matmul path
#   "woop-xla"   alias of "woop" (kept so configs can be explicit)
#   "woop-fused" force the fused VMEM Pallas kernel
#   "mt"         direct XLA Moller-Trumbore on the VPU
# Same accept predicate in every case (bitwise-equal hits, tested).
DENSE_ALGO = _os.environ.get("MCPT_INTERSECT", "auto")
_VALID_DENSE = ("auto", "woop", "woop-xla", "woop-fused", "mt")
if DENSE_ALGO not in _VALID_DENSE:
    raise ValueError(
        f"MCPT_INTERSECT={DENSE_ALGO!r} is not one of {_VALID_DENSE}; unknown "
        "values used to fall back to Woop silently, which hid typos. "
        "('pallas' was removed in round 4 — use 'woop' or 'woop-fused'.)"
    )

# Below this the fused kernel's fixed per-tile costs lose to the fully
# XLA-fused tiny wave (cornell's 32 triangles render at 146 Mrays/s
# through plain XLA; a 256-tile kernel launch would dominate).
DENSE_KERNEL_MIN_TRIS = 256


# Large-scene traversal override: "treelets" (Pallas megakernel; the
# default) or "bvh" (skip-link walk fallback). Read at trace time — like
# DENSE_ALGO, changing it after a render program is compiled has no effect
# on that program.
TRAVERSAL = _os.environ.get("MCPT_TRAVERSAL", "auto")
_VALID_TRAVERSAL = ("auto", "treelets", "bvh")
if TRAVERSAL not in _VALID_TRAVERSAL:
    raise ValueError(
        f"MCPT_TRAVERSAL={TRAVERSAL!r} is not one of {_VALID_TRAVERSAL}. "
        "('blocks' was removed in round 4 — use 'treelets' or 'bvh'.)"
    )


# Trace-time context: parallel/shard.render_pass_sharded sets this while
# its (jitted) body traces, steering `auto` dense dispatch away from the
# fused kernel inside shard_map programs.
_IN_SHARDED_TRACE = False


def uses_woop_kernel(scene) -> bool:
    """Static: does dispatch use the fused VMEM Woop kernel?

    Default ON (MCPT_INTERSECT=auto) for mid scenes on a real TPU since
    round 5: the pipelined split wavefront (renderer.trace_chunk_split)
    keeps the kernel in its own device program, so the round-4
    fusion-inflation poison pill (any Pallas call inside the while body
    inflated neighboring XLA fusions ~12x) no longer applies — measured
    veach-mis e2e 7.8 vs 6.6 Mrays/s. MCPT_INTERSECT=woop opts out.
    """
    if uses_treelets(scene):
        return False
    if scene.num_tris > BRUTE_FORCE_MAX_TRIS and scene.bvh is not None:
        # the skip-link BVH walk wins dispatch for large scenes with
        # treelets unavailable — it returns Hit without u/v, so this
        # predicate MUST be False or the integrator would pick the slim
        # expander and dereference hit.u == None
        return False
    if scene.num_tris <= DENSE_KERNEL_MIN_TRIS:
        # tiny scenes (cornell's 32 tris) lose badly in the kernel: the
        # fully XLA-fused wave wins (round-4 advisor: the per-call packing
        # fallback used to route them to the kernel anyway)
        return False
    if DENSE_ALGO == "woop-fused":
        return True
    if DENSE_ALGO != "auto":
        return False
    if _IN_SHARDED_TRACE:
        # a shard_map pass is ONE device program with a lax.while_loop —
        # the fusion-inflation regime the split loop exists to avoid; the
        # pure-XLA dense path is the measured winner there (PERF_NOTES)
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def dispatch_returns_uv(scene) -> bool:
    """Static: does closest_hit return kernel-computed (u, v)? (Treelet
    megakernel and fused Woop kernel do; the integrator then uses the slim
    17-column shading expansion.)"""
    return uses_treelets(scene) or uses_woop_kernel(scene)


def uses_treelets(scene) -> bool:
    """Static (trace-time) predicate: does dispatch use the treelet kernel?

    Shared by closest_hit/any_hit and the integrator's expander choice
    (integrator.make_expander) so the two can never disagree. True when
    the scene carries a treelet layout, the count is past the crossover,
    and the backend runs Pallas natively (or MCPT_TRAVERSAL forces it).
    """
    if scene.treelets is None or TRAVERSAL == "bvh":
        return False
    if scene.num_tris <= TREELET_MIN_TRIS:
        return False
    if TRAVERSAL == "treelets":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def closest_hit(scene: Scene, org, dirn, t_min=T_MIN, t_max=F32_MAX) -> Hit:
    """Dispatch (four paths since round 5):

      * treelet Pallas megakernel — every scene past TREELET_MIN_TRIS on a
        real TPU (ops/pallas/traverse); the reference analogously builds a
        BVH for every scene (src/Render.cpp:9)
      * skip-link BVH walk — large scenes off-TPU / MCPT_TRAVERSAL=bvh
        (ops/traverse)
      * fused VMEM Woop kernel — mid scenes (DENSE_KERNEL_MIN_TRIS <
        T <= BRUTE_FORCE_MAX_TRIS) on a real TPU, run under the pipelined
        split wavefront (ops/pallas/woop; see uses_woop_kernel)
      * dense intersect-all (XLA Woop matmul or plain Moller-Trumbore) —
        tiny scenes, where the fully XLA-fused wave beats everything
    """
    sg = jax.lax.stop_gradient
    if uses_treelets(scene):
        from mcpt_tpu.ops.pallas.traverse import closest_hit_treelets

        # hit SELECTION is discrete — detaching the ray loses no gradient
        # (the integrator re-derives t/u/v attached via expand_hit under
        # AD); Pallas kernels have no VJP, so attached inputs would error
        # inside jax.grad.
        return closest_hit_treelets(scene, sg(org), sg(dirn), t_min, sg(t_max))
    if scene.num_tris > BRUTE_FORCE_MAX_TRIS and scene.bvh is not None:
        from mcpt_tpu.ops.traverse import closest_hit_bvh

        # same: lax.while_loop has no reverse-mode rule
        return closest_hit_bvh(scene, sg(org), sg(dirn), t_min, sg(t_max))
    if uses_woop_kernel(scene):
        from mcpt_tpu.ops.pallas.woop import closest_hit_woop_fused

        return closest_hit_woop_fused(scene, sg(org), sg(dirn), t_min,
                                      sg(t_max))
    if _os.environ.get("MCPT_F64_GEOM") == "1":
        # reference-parity escape hatch: geometry in double
        # (src/utils.h:5-18). Dense scenes only; requires jax x64.
        return closest_hit_bruteforce(scene, org, dirn, t_min, t_max,
                                      f64=True)
    if DENSE_ALGO == "mt":
        return closest_hit_bruteforce(scene, org, dirn, t_min, t_max)
    return closest_hit_woop(scene, org, dirn, t_min, t_max)


def any_hit(scene: Scene, org, dirn, t_min=T_MIN, t_max=F32_MAX) -> jnp.ndarray:
    sg = jax.lax.stop_gradient
    if uses_treelets(scene):
        from mcpt_tpu.ops.pallas.traverse import any_hit_treelets

        # boolean output: detaching inputs builds no backward graph
        return any_hit_treelets(scene, sg(org), sg(dirn), t_min, sg(t_max))
    if scene.num_tris > BRUTE_FORCE_MAX_TRIS and scene.bvh is not None:
        from mcpt_tpu.ops.traverse import any_hit_bvh

        return any_hit_bvh(scene, sg(org), sg(dirn), t_min, sg(t_max))
    if uses_woop_kernel(scene):
        from mcpt_tpu.ops.pallas.woop import any_hit_woop_fused

        return any_hit_woop_fused(scene, sg(org), sg(dirn), t_min, sg(t_max))
    if _os.environ.get("MCPT_F64_GEOM") == "1":
        return any_hit_bruteforce(scene, org, dirn, t_min, t_max, f64=True)
    if DENSE_ALGO == "mt":
        return any_hit_bruteforce(scene, org, dirn, t_min, t_max)
    return any_hit_woop(scene, org, dirn, t_min, t_max)
