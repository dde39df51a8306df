"""Wavefront path integrator: the reference's iterative estimator as a
fixed-shape `lax.scan` over bounces with masked lanes.

This is a faithful TPU-native re-derivation of the ACTIVE integrator in the
reference (src/Render.cpp:111-175):

  * bounce-0 emitter hit adds radiance directly (Render.cpp:121-122,
    threshold |radiance| > 1e-4)
  * NEE: one uniform light point per bounce; pdf = d^2/(cos_l * area); MIS
    power heuristic vs the BSDF mixture pdf with the light pdf divided by
    n_lights inside the heuristic and the contribution multiplied by n_lights
    (Render.cpp:124-130, Render.cpp:202-223)
  * BSDF step: one-sample lobe mixture; terminate on pdf == 0; beta *=
    f * |cos| / pdf (Render.cpp:133-140)
  * look-ahead: trace the new ray; a front-facing emissive hit adds
    MIS-weighted emission — full weight after a mirror bounce, else
    power_heuristic(bsdf_pdf, light_pdf) with light_pdf =
    dist^2/cos/n_lights/area (Render.cpp:142-162; emissive test is
    |radiance| > 0, Render.cpp:146)
  * Russian roulette after bounce 3: q = min(max_comp(beta), 0.95)
    (Render.cpp:164-170)

Differences by design (not bugs):
  * the reference re-traces each path ray twice per bounce (loop head +
    look-ahead, Render.cpp:118+144, SURVEY §3.3) — here each ray is traced
    once and the hit record is carried;
  * recursion/unbounded loop -> fixed `max_bounces` scan (RR makes the tail
    contribution negligible) so the whole program is one XLA computation;
  * per-ray counter-based RNG (threefry fold_in per bounce) replaces the
    racy shared mt19937 (src/utils.h:23-28, SURVEY §5);
  * secondary rays use a scene-relative t_min (f32 vs the reference's f64).

Sampling decisions, pdfs, and RR are wrapped in stop_gradient so the same
code path yields detached-sampling gradients for materials/emission
(d pixel / d {kd, ks, radiance}) under jax.grad.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from mcpt_tpu.ops.intersect import F32_MAX, Hit, any_hit, closest_hit
from mcpt_tpu.render.bsdf import bsdf_fx, bsdf_pdf, bsdf_sample, build_lobes
from mcpt_tpu.render.onb import make_onb, to_local, to_world
from mcpt_tpu.scene import Scene
from mcpt_tpu.utils.math import dot, normalize, power_heuristic

sg = jax.lax.stop_gradient

# Relative secondary-ray epsilon (the reference's absolute t1=1e-4 scaled by
# scene size; see Scene.scale).
RAY_EPS_REL = 1e-4
# Emitter thresholds, in reference order of appearance:
EMIT_DIRECT_THRESH = 1e-4  # bounce-0 direct add (Render.cpp:121)
RR_START_BOUNCE = 3  # RR applies when bounces > 3 (Render.cpp:164)
RR_CLAMP = 0.95


@dataclass(frozen=True)
class PathState:
    org: jnp.ndarray  # f32[R,3] origin of the ray that produced `hit`
    dirn: jnp.ndarray  # f32[R,3]
    hit_t: jnp.ndarray  # f32[R]
    hit_tri: jnp.ndarray  # i32[R]
    hit_u: jnp.ndarray
    hit_v: jnp.ndarray
    L: jnp.ndarray  # f32[R,3] accumulated radiance
    beta: jnp.ndarray  # f32[R,3] path throughput
    active: jnp.ndarray  # bool[R]


jax.tree_util.register_dataclass(
    PathState,
    data_fields=["org", "dirn", "hit_t", "hit_tri", "hit_u", "hit_v", "L", "beta", "active"],
    meta_fields=[],
)


def texture_kd(scene: Scene, mat_id, uv):
    """Diffuse reflectance with nearest-neighbor texture lookup.

    Matches reference Texture::get_color (src/model.cpp:30-41): fract + clamp
    to [0, 0.999], x = int(u*w), row-major top-down, no filtering.
    """
    kd_const = scene.mats.kd[mat_id]  # [R,3]
    tex_id = scene.mats.tex_id[mat_id]
    has_tex = tex_id >= 0
    if scene.atlas.data.shape[0] == 1 and scene.atlas.data.shape[1] == 1:
        # no textures in scene: skip the gather entirely
        return kd_const
    tid = jnp.maximum(tex_id, 0)
    wh = scene.atlas.size[tid]  # [R,2]
    u = jnp.clip(uv[:, 0] - jnp.floor(uv[:, 0]), 0.0, 0.999)
    v = jnp.clip(uv[:, 1] - jnp.floor(uv[:, 1]), 0.0, 0.999)
    x = (u * wh[:, 0]).astype(jnp.int32)
    y = (v * wh[:, 1]).astype(jnp.int32)
    texel = scene.atlas.data[tid, y, x]  # [R,3]
    return jnp.where(has_tex[:, None], texel, kd_const)


def gather_hit_info(scene: Scene, hit: Hit, dirn):
    """Expand a Hit into shading quantities (reference Triangle.cpp:66-78)."""
    g = scene.geom
    tri = jnp.maximum(hit.tri, 0)
    v0 = g.v0[tri]
    e1 = g.e1[tri]
    e2 = g.e2[tri]
    u = hit.u[:, None]
    v = hit.v[:, None]
    point = v0 + u * e1 + v * e2  # == interplote_Vertex (Triangle.cpp:68)
    vn = g.vn[tri]  # [R,3,3]
    n = normalize((1.0 - u - v) * vn[:, 0] + u * vn[:, 1] + v * vn[:, 2])
    uvs = g.uv[tri]  # [R,3,2]
    uv = (1.0 - u - v) * uvs[:, 0] + u * uvs[:, 1] + v * uvs[:, 2]
    front = dot(n, dirn) < 0  # Triangle.cpp:71
    mat_id = g.mat_id[tri]
    area = g.area[tri]
    return point, n, uv, front, mat_id, area


def sample_light_point(scene: Scene, u0, u1, u2):
    """Uniform light-triangle point (reference Render::sample + sample_Point2).

    Returns (point [R,3], normal [R,3], radiance [R,3], area [R]).
    """
    g = scene.geom
    n_lights = scene.num_lights
    idx = jnp.minimum((u0 * n_lights).astype(jnp.int32), n_lights - 1)
    tri = scene.light_tris[idx]
    # reflection trick for uniform barycentrics (Triangle.cpp:15-22)
    flip = u1 + u2 > 1.0
    bu = jnp.where(flip, 1.0 - u1, u1)[:, None]
    bv = jnp.where(flip, 1.0 - u2, u2)[:, None]
    v0 = g.v0[tri]
    e1 = g.e1[tri]
    e2 = g.e2[tri]
    point = v0 + bu * e1 + bv * e2
    vn = g.vn[tri]
    nrm = normalize((1.0 - bu - bv) * vn[:, 0] + bu * vn[:, 1] + bv * vn[:, 2])
    rad = scene.mats.radiance[g.mat_id[tri]]
    return point, nrm, rad, g.area[tri]


def trace_paths(
    scene: Scene,
    org: jnp.ndarray,
    dirn: jnp.ndarray,
    ray_keys: jnp.ndarray,
    max_bounces: int = 24,
    with_stats: bool = False,
):
    """Trace a batch of camera rays to radiance [R,3].

    `ray_keys` are per-ray counter-based PRNG keys (utils/rng.py), so the
    result for a pixel is independent of batching/sharding; uniforms are
    drawn as [R, 7] blocks per bounce.
    """
    from mcpt_tpu.utils.rng import ray_uniforms

    R = org.shape[0]
    t_min = RAY_EPS_REL * scene.scale
    n_lights = scene.num_lights

    hit = closest_hit(scene, org, dirn, t_min=t_min)
    point, nrm, uv, front, mat_id, area = gather_hit_info(scene, hit, dirn)

    # bounce-0 direct emission (Render.cpp:121-122)
    rad0 = scene.mats.radiance[mat_id]
    emis0 = jnp.sqrt(jnp.sum(rad0 * rad0, axis=-1)) > EMIT_DIRECT_THRESH
    L = jnp.where((hit.valid & emis0)[:, None], rad0, 0.0)
    beta = jnp.ones((R, 3))
    active = hit.valid

    def bounce_body(carry, b):
        (org_c, dir_c, point, nrm, uv, front, mat_id, area, L, beta, active, nrays) = carry
        entered = active  # lanes doing real work this bounce (NEE + path ray)
        u = ray_uniforms(ray_keys, b + 1, 7)

        mats = scene.mats
        kd_tex = texture_kd(scene, mat_id, uv)
        lobes = build_lobes(kd_tex, mats.ks[mat_id], mats.ns[mat_id])
        onb = make_onb(nrm)
        wo_local = to_local(onb, -dir_c)

        # ---------------- NEE (Render.cpp:124-130) ----------------
        if n_lights > 0:
            lpoint, lnrm, lrad, larea = sample_light_point(
                scene, u[:, 0], u[:, 1], u[:, 2]
            )
            d = lpoint - point
            dist2 = jnp.sum(d * d, axis=-1)
            dist = jnp.sqrt(dist2)
            wl = d / jnp.maximum(dist, 1e-30)[:, None]
            cos_l = dot(-wl, lnrm)
            pdf_l = jnp.where(
                cos_l != 0.0,
                dist2 / jnp.where(cos_l != 0.0, cos_l, 1.0) / jnp.maximum(larea, 1e-30),
                0.0,
            )
            pdf_l = sg(pdf_l)
            wl = sg(wl)
            # visibility: any-hit over (t_min, dist) — the reference's
            # inclusive t<=t2 bound would let the light occlude itself at
            # f32, so the upper bound backs off by a relative epsilon.
            shadow_org = point
            occluded = any_hit(
                scene, sg(shadow_org), wl, t_min=t_min, t_max=sg(dist) * (1.0 - 1e-3)
            )
            wl_local = to_local(onb, wl)
            bp = sg(bsdf_pdf(lobes, wo_local, wl_local))
            w_mis = power_heuristic(pdf_l / n_lights, bp)
            fx = bsdf_fx(lobes, wo_local, wl_local)
            cos_s = jnp.abs(dot(nrm, wl))
            contrib = (
                w_mis[:, None]
                * beta
                * lrad
                * fx
                * (cos_s / jnp.where(pdf_l != 0, pdf_l, 1.0))[:, None]
                * n_lights
            )
            nee_ok = active & (pdf_l != 0.0) & ~occluded
            L = L + jnp.where(nee_ok[:, None], contrib, 0.0)

        # ---------------- BSDF sampling (Render.cpp:133-140) ----------------
        wi_local, f, pdf, is_mirror = bsdf_sample(
            lobes, wo_local, u[:, 3], u[:, 4], u[:, 5]
        )
        pdf = sg(pdf)
        wi_local = sg(wi_local)
        is_mirror = sg(is_mirror)
        active = active & (pdf != 0.0)
        wi_world = to_world(onb, wi_local)
        cos_s = jnp.abs(dot(nrm, wi_world))
        beta_new = beta * f * (cos_s / jnp.where(pdf != 0, pdf, 1.0))[:, None]
        beta = jnp.where(active[:, None], beta_new, beta)

        # ---------------- look-ahead trace (Render.cpp:142-162) -------------
        nxt = closest_hit(scene, sg(point), wi_world, t_min=t_min)
        n_point, n_nrm, n_uv, n_front, n_mat, n_area = gather_hit_info(
            scene, nxt, wi_world
        )
        rad_n = scene.mats.radiance[n_mat]
        emis_n = jnp.sqrt(jnp.sum(rad_n * rad_n, axis=-1)) > 0.0  # truthiness
        hit_light = active & nxt.valid & emis_n & n_front

        dl = point - n_point
        dist2l = jnp.sum(dl * dl, axis=-1)
        cos_nl = dot(normalize(dl, eps=1e-30), n_nrm)
        light_pdf = jnp.where(
            cos_nl != 0.0,
            dist2l
            / jnp.where(cos_nl != 0.0, cos_nl, 1.0)
            / jnp.maximum(float(max(n_lights, 1)), 1.0)
            / jnp.maximum(n_area, 1e-30),
            0.0,
        )
        w_hit = power_heuristic(pdf, sg(light_pdf))
        emit_contrib = jnp.where(
            is_mirror[:, None], beta * rad_n, beta * rad_n * w_hit[:, None]
        )
        L = L + jnp.where(hit_light[:, None], emit_contrib, 0.0)

        active = active & nxt.valid

        # ---------------- Russian roulette (Render.cpp:164-170) -------------
        q = sg(jnp.minimum(jnp.max(beta, axis=-1), RR_CLAMP))
        do_rr = (b > RR_START_BOUNCE) & active
        killed = do_rr & (u[:, 6] > q)
        survived = do_rr & ~killed
        beta = jnp.where(survived[:, None], beta / jnp.maximum(q, 1e-30)[:, None], beta)
        active = active & ~killed

        # traced-ray accounting: one path ray + one shadow ray per lane that
        # entered this bounce (the reference additionally re-traces the path
        # ray at the loop head, which we don't replicate)
        nrays = nrays + jnp.sum(entered.astype(jnp.int32)) * 2

        carry = (
            point, wi_world, n_point, n_nrm, n_uv, n_front, n_mat, n_area,
            L, beta, active, nrays,
        )
        return carry, None

    nrays0 = jnp.asarray(R, jnp.int32)  # primary rays
    carry = (org, dirn, point, nrm, uv, front, mat_id, area, L, beta, active, nrays0)
    carry, _ = jax.lax.scan(bounce_body, carry, jnp.arange(max_bounces))
    L = carry[8]
    if with_stats:
        return L, carry[11]
    return L


# Rays per wavefront chunk. Bounds the [chunk, T] intersection working set to
# VMEM-friendly sizes; one 1024^2 pass streams 16 chunks through the same
# program instead of materializing ~400 MB [R,T,3] intermediates in HBM.
DEFAULT_CHUNK_RAYS = 65536


def trace_image(
    scene: Scene,
    cam,
    sample_key: jnp.ndarray,
    pixel_idx: jnp.ndarray,
    max_bounces: int,
    chunk_rays: int = DEFAULT_CHUNK_RAYS,
    with_stats: bool = False,
):
    """Trace one sample for `pixel_idx` pixels, chunked over the ray batch.

    Returns radiance [R,3] (and traced-ray count if with_stats). The RNG is
    keyed by global pixel id, so chunking does not change any sample.
    """
    from mcpt_tpu.render.camera import generate_rays
    from mcpt_tpu.utils.rng import per_ray_keys, ray_uniforms

    R = pixel_idx.shape[0]
    chunk = min(chunk_rays, R)
    n_chunks = -(-R // chunk)
    Rp = n_chunks * chunk
    # padded lanes re-trace pixel 0; their output is discarded
    pidx = jnp.concatenate([pixel_idx, jnp.zeros((Rp - R,), jnp.int32)])

    def body(nrays, pidx_chunk):
        ray_keys = per_ray_keys(sample_key, pidx_chunk)
        jitter = ray_uniforms(ray_keys, 0, 2)
        org, dirn = generate_rays(cam, jitter, pidx_chunk)
        out = trace_paths(
            scene, org, dirn, ray_keys, max_bounces=max_bounces, with_stats=with_stats
        )
        if with_stats:
            rad, nr = out
            return nrays + nr, rad
        return nrays, out

    if n_chunks == 1:
        nrays, rad = body(jnp.zeros((), jnp.int32), pidx)
        rad = rad[:R]
    else:
        nrays, rads = jax.lax.scan(
            body, jnp.zeros((), jnp.int32), pidx.reshape(n_chunks, chunk)
        )
        rad = rads.reshape(Rp, 3)[:R]
    if with_stats:
        return rad, nrays
    return rad
