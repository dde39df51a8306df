"""Edge-aware (silhouette) gradients: boundary sampling for NEE visibility.

The production estimator (diff/grad.py) is detached-random: it freezes every
discrete decision, so d(pixel)/d(vertex) misses the VISIBILITY term — the
derivative contributed by a silhouette sweeping across the light as an
occluder moves. For an occluder the camera never sees directly, the detached
gradient is exactly zero while the true expected-image derivative is not
(the penumbra moves). The reference implements none of this (its hit and
shadow logic, src/BVH.cpp:90-136 + src/Triangle.cpp:48-106, is primal-only);
this is the BASELINE north star's "reparameterized/edge-aware gradients"
stage.

This module is the boundary-sampling estimator for the dominant such term:
direct lighting through NEE/BSDF at the FIRST path vertex (the classic
edge-sampling formulation of Li et al. 2018, "Differentiable Monte Carlo Ray
Tracing through Edge Sampling", specialized to a polygonal area light).

Derivation (Reynolds transport over the light surface): the direct
illumination at shading point x is

    I(x) = INT_L f(x, y) V(x, y) dA(y),
    f = brdf(x) * Le * cos_x * cos_y / d^2        (area-form integrand)

V's discontinuity boundary on the light plane is the projection of the
occluder's silhouette edges from x. For boundary curve y(s) moving with
parameter velocity dy/dtheta,

    dI/dtheta = INT_C f(x, y(s)) (dy/dtheta . n_occ(s)) |dy/ds| ds

with n_occ the in-plane curve normal pointing INTO the occluded region
(boundary moving toward the shadow shrinks it -> I grows). Note f carries
NO MIS weight: NEE and the BSDF-hit-light strategy split the same integrand,
so their edge terms sum back to the full-f boundary integral — one estimator
covers both.

The projection y(p) = x + c (p - x), c = <q0-x, n_l> / <p-x, n_l>, has the
closed-form Jacobian dy/dp = c (I - (p-x) n_l^T / <p-x, n_l>), so the whole
estimator is vectorized jnp with stratified edge samples — no per-sample
autodiff, no RNG.

PROTOTYPE SCOPE (documented, tested in tests/test_grad.py):
  * first-vertex direct lighting, diffuse shading point (kd/pi);
  * silhouette set = the given boundary edges, assumed valid from every
    shading point (exact for a single convex occluder — the scene class
    the FD validation uses); a general scene needs a per-(x, edge)
    silhouette + mutual-occlusion test on top of the same integrand;
  * one parallelogram light (v0, e_u, e_v), constant radiance.
"""
from __future__ import annotations

import jax.numpy as jnp

from mcpt_tpu.utils.math import cross, dot, normalize


def nee_visibility_edge_grad(
    x: jnp.ndarray,  # [R,3] shading points (first path vertices)
    n_x: jnp.ndarray,  # [R,3] shading normals
    kd: jnp.ndarray,  # [R,3] diffuse albedo at x
    weight: jnp.ndarray,  # [R,3] adjoint dLoss/dpixel (e.g. 1/(N*3) for mean)
    occ_verts: jnp.ndarray,  # [V,3] occluder vertex positions
    occ_edges: jnp.ndarray,  # i32[E,2] boundary-edge vertex indices
    light_q0: jnp.ndarray,  # [3] light parallelogram corner
    light_eu: jnp.ndarray,  # [3] edge u (q0 -> q0+eu)
    light_ev: jnp.ndarray,  # [3] edge v
    light_le: jnp.ndarray,  # [3] constant emitted radiance
    n_samples: int = 128,
) -> jnp.ndarray:
    """d(Loss)/d(occ_verts) [V,3]: the visibility edge term of first-vertex
    direct lighting, for a loss with per-pixel adjoint `weight`.

    Stratified midpoint samples along each edge; contributions from samples
    whose projection lands outside the light are zero (the boundary only
    matters where it crosses the emitter).
    """
    R = x.shape[0]
    E = occ_edges.shape[0]
    S = n_samples

    n_l = normalize(cross(light_eu, light_ev))  # light plane normal
    # dual basis for the inside-parallelogram test
    eu, ev = light_eu, light_ev
    guu, guv, gvv = dot(eu, eu), dot(eu, ev), dot(ev, ev)
    det_g = guu * gvv - guv * guv
    # occluder centroid projected per shading point orients n_occ
    centroid = jnp.mean(occ_verts, axis=0)

    va = occ_verts[occ_edges[:, 0]]  # [E,3]
    vb = occ_verts[occ_edges[:, 1]]
    s = (jnp.arange(S) + 0.5) / S  # stratified midpoints

    # p[E,S,3] edge sample points
    p = va[:, None, :] + s[None, :, None] * (vb - va)[:, None, :]
    # broadcast layout: [R, E, S, 3]
    xb = x[:, None, None, :]
    pb = p[None, :, :, :]
    d_xp = pb - xb
    h = jnp.sum(d_xp * n_l, axis=-1)  # <p-x, n_l>  [R,E,S]
    A0 = jnp.sum((light_q0 - x) * n_l, axis=-1)  # [R]
    A = A0[:, None, None]  # <q0-x, n_l>
    # only edges strictly between x and the light plane cast this boundary
    valid_h = (jnp.abs(h) > 1e-12) & (A / jnp.where(h == 0, 1.0, h) > 1.0)
    c = jnp.where(valid_h, A / jnp.where(jnp.abs(h) > 1e-12, h, 1.0), 0.0)
    y = xb + c[..., None] * d_xp  # [R,E,S,3] projected boundary points

    # inside-parallelogram test in the light's (u, v) coordinates
    rel = y - light_q0
    bu = jnp.sum(rel * eu, axis=-1)
    bv = jnp.sum(rel * ev, axis=-1)
    au = (gvv * bu - guv * bv) / det_g
    av = (guu * bv - guv * bu) / det_g
    inside = (au >= 0) & (au <= 1) & (av >= 0) & (av <= 1) & valid_h

    # integrand f(x, y) (area form, full — no MIS split; see module doc)
    d_xy = y - xb
    d2 = jnp.sum(d_xy * d_xy, axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
    w_dir = d_xy / dist[..., None]
    cos_x = jnp.maximum(jnp.sum(n_x[:, None, None, :] * w_dir, axis=-1), 0.0)
    cos_y = jnp.maximum(jnp.sum(-w_dir * n_l, axis=-1), 0.0)
    geom = cos_x * cos_y / jnp.maximum(d2, 1e-20)  # [R,E,S]
    f_rgb = (kd[:, None, None, :] / jnp.pi) * light_le * geom[..., None]

    # curve tangent dy/ds and speed |dy/ds| via the closed-form Jacobian
    #   dy/dp = c (I - (p-x) n_l^T / h)
    e_dir = (vb - va)[None, :, None, :]  # dp/ds (unnormalized)

    def jac_apply(v):  # dy/dp @ v for v [.,3] broadcast over [R,E,S,3]
        return c[..., None] * (
            v - d_xp * (jnp.sum(v * n_l, axis=-1) / jnp.where(
                jnp.abs(h) > 1e-12, h, 1.0))[..., None]
        )

    dy_ds = jac_apply(e_dir)  # [R,E,S,3]
    speed = jnp.sqrt(jnp.maximum(jnp.sum(dy_ds * dy_ds, axis=-1), 1e-30))
    tau = dy_ds / speed[..., None]
    n_curve = cross(jnp.broadcast_to(n_l, tau.shape), tau)  # in light plane
    # orient toward the occluded side: the projected occluder centroid
    h_c = jnp.sum((centroid - x) * n_l, axis=-1)  # [R]
    c_c = A0 / jnp.where(jnp.abs(h_c) > 1e-12, h_c, 1e-12)
    y_c = x + c_c[:, None] * (centroid - x)  # [R,3] on the light plane
    sign = jnp.sign(jnp.sum((y_c[:, None, None, :] - y) * n_curve, axis=-1))
    n_occ = n_curve * jnp.where(sign == 0, 1.0, sign)[..., None]

    # adjoint weight: scalar per (pixel, edge, sample)
    w_pix = jnp.sum(weight[:, None, None, :] * f_rgb, axis=-1)  # [R,E,S]
    common = jnp.where(inside, w_pix * speed, 0.0) / S  # MC weight, ds = 1/S

    # dy/dtheta for vertex a: dy/dp @ (1-s) I -> (1-s) * (n_occ^T dy/dp);
    # the Jacobian is symmetric in structure, so apply it to n_occ as a
    # VJP: n_occ^T dy/dp = c (n_occ - <n_occ, d_xp> n_l / h)... careful:
    # (dy/dp)^T v = c (v - n_l <d_xp, v> / h). Note the TRANSPOSE swaps
    # which factor carries n_l.
    def jac_T_apply(v):  # (dy/dp)^T @ v
        return c[..., None] * (
            v - jnp.broadcast_to(n_l, v.shape) * (
                jnp.sum(d_xp * v, axis=-1) / jnp.where(
                    jnp.abs(h) > 1e-12, h, 1.0))[..., None]
        )

    vjp_n = jac_T_apply(n_occ)  # [R,E,S,3] = d<y, n_occ>/dp
    contrib = common[..., None] * vjp_n  # [R,E,S,3]

    ga = jnp.sum(contrib * (1.0 - s)[None, None, :, None], axis=(0, 2))  # [E,3]
    gb = jnp.sum(contrib * s[None, None, :, None], axis=(0, 2))

    grad = jnp.zeros_like(occ_verts)
    grad = grad.at[occ_edges[:, 0]].add(ga)
    grad = grad.at[occ_edges[:, 1]].add(gb)
    return grad
