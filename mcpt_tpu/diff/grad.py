"""Differentiable rendering: d(pixels)/d(materials, emission).

The estimator in render/integrator.py wraps every sampling decision, pdf,
and RR factor in stop_gradient, so jax.grad of a render is the standard
*detached-sampling* gradient (the sampler acts as a fixed importance
distribution): unbiased for interior integrands, missing visibility-edge
terms (vertex gradients are future work — BASELINE north star's
"reparameterized/edge-aware" stage).

Differentiable parameters: per-material kd, ks, radiance. The counter-based
RNG makes the estimator a deterministic function of (params, seed), so
finite differences validate autodiff directly (tests/test_grad.py).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from mcpt_tpu.render.integrator import trace_image
from mcpt_tpu.scene import Scene


@dataclass(frozen=True)
class SceneParams:
    """The differentiable subset of the material table."""

    kd: jnp.ndarray  # [M,3]
    ks: jnp.ndarray  # [M,3]
    radiance: jnp.ndarray  # [M,3]


jax.tree_util.register_dataclass(
    SceneParams, data_fields=["kd", "ks", "radiance"], meta_fields=[]
)


def extract_params(scene: Scene) -> SceneParams:
    return SceneParams(kd=scene.mats.kd, ks=scene.mats.ks, radiance=scene.mats.radiance)


def apply_params(scene: Scene, params: SceneParams) -> Scene:
    mats = dataclasses.replace(
        scene.mats, kd=params.kd, ks=params.ks, radiance=params.radiance
    )
    return dataclasses.replace(scene, mats=mats)


def render_image(
    params: SceneParams,
    scene: Scene,
    key,
    spp: int,
    max_bounces: int,
) -> jnp.ndarray:
    """Differentiable render -> mean radiance [H,W,3] as a function of params."""
    sc = apply_params(scene, params)
    cam = sc.camera
    W, H = cam.width, cam.height
    pixel_idx = jnp.arange(W * H, dtype=jnp.int32)

    def one(acc, s):
        ks = jax.random.fold_in(key, s)
        rad = trace_image(sc, cam, ks, pixel_idx, max_bounces, differentiable=True)
        # scrub non-finite samples like the film does (reference
        # Scene.cpp:15-18); backward contribution of scrubbed lanes is 0
        rad = jnp.where(jnp.isfinite(rad), rad, 0.0)
        return acc + rad, None

    acc, _ = jax.lax.scan(one, jnp.zeros((W * H, 3)), jnp.arange(spp))
    return (acc / spp).reshape(H, W, 3)


def mse_loss(
    params: SceneParams, scene: Scene, target: jnp.ndarray, key, spp: int,
    max_bounces: int,
) -> jnp.ndarray:
    img = render_image(params, scene, key, spp, max_bounces)
    return jnp.mean((img - target) ** 2)


def mse_loss_dual(
    params: SceneParams, scene: Scene, target: jnp.ndarray, key, spp: int,
    max_bounces: int,
) -> jnp.ndarray:
    """Unbiased MSE surrogate from two independent renders.

    grad of mean((A-t)(B-t)) with A,B independent estimates of the true image
    is an unbiased estimate of grad of the TRUE squared error — plain MSE of
    a noisy render also differentiates the estimator's variance, which at low
    spp biases albedo downward (lower albedo = lower variance).
    """
    ka, kb = jax.random.split(key)
    a = render_image(params, scene, ka, spp, max_bounces)
    b = render_image(params, scene, kb, spp, max_bounces)
    return jnp.mean((a - target) * (b - target))


loss_and_grad = jax.value_and_grad(mse_loss)
