"""Counter-based per-ray RNG.

The reference uses one function-static mt19937 mutated concurrently by every
OpenMP thread — a real data race (src/utils.h:23-28 + src/Render.cpp:60,
SURVEY §5). Here randomness is a pure function of
(seed, sample_index, pixel_id, bounce, slot): threefry keys derived per ray
via vmapped fold_in. Consequences:

  * deterministic and reproducible for a fixed seed — images are
    bit-identical run to run;
  * batch-invariant: a pixel's samples do not depend on how the ray batch is
    tiled or sharded, so multi-chip renders equal single-chip renders
    bitwise (tested in tests/test_parallel.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def per_ray_keys(key: jnp.ndarray, ray_id: jnp.ndarray) -> jnp.ndarray:
    """Derive one PRNG key per ray from its global id. ray_id: i32[R]."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(ray_id)


def ray_uniforms(ray_keys: jnp.ndarray, tag: int | jnp.ndarray, n: int) -> jnp.ndarray:
    """[R, n] uniforms for stream `tag` (e.g. bounce index) of each ray."""
    return jax.vmap(lambda k: jax.random.uniform(jax.random.fold_in(k, tag), (n,)))(
        ray_keys
    )
