"""Benchmark helpers: instrumented ray-count measurement."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mcpt_tpu.render.camera import generate_rays
from mcpt_tpu.render.integrator import trace_paths
from mcpt_tpu.scene import Scene
from mcpt_tpu.utils.rng import per_ray_keys, ray_uniforms


@partial(jax.jit, static_argnames=("max_bounces", "spp_per_pass"))
def instrumented_pass(scene: Scene, key, start_idx, max_bounces: int, spp_per_pass: int):
    """Run one pass, returning (mean_radiance_sum, traced_ray_count)."""
    cam = scene.camera
    W, H = cam.width, cam.height
    R = W * H
    pixel_idx = jnp.arange(R, dtype=jnp.int32)

    from mcpt_tpu.render.integrator import trace_image

    def one_sample(carry, s):
        total_rays = carry
        ks = jax.random.fold_in(key, start_idx + s)
        _, nrays = trace_image(
            scene, cam, ks, pixel_idx, max_bounces, with_stats=True
        )
        return total_rays + nrays, None

    total, _ = jax.lax.scan(
        one_sample, jnp.zeros((), jnp.int32), jnp.arange(spp_per_pass)
    )
    return total


def count_rays_per_pass(scene: Scene, config, sample_start: int = 0) -> float:
    """Traced rays in one spp_per_pass pass (device-measured)."""
    import dataclasses as dc

    cam = dc.replace(
        scene.camera,
        width=config.width or scene.camera.width,
        height=config.height or scene.camera.height,
    )
    scene = dc.replace(scene, camera=cam)
    key = jax.random.PRNGKey(config.seed)
    total = instrumented_pass(
        scene,
        key,
        jnp.asarray(sample_start, jnp.int32),
        config.max_bounces,
        config.spp_per_pass,
    )
    return float(total)
