"""Compare large-scene traversal paths on the real TPU: Pallas treelets vs
XLA block-wave, on coherent camera rays and incoherent random rays."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mcpt_tpu.io.obj import load_scene

scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/bathroom-stress.obj"
t0 = time.perf_counter()
scene = load_scene(scene_path, with_bvh=True)
print(f"loaded {scene.num_tris} tris in {time.perf_counter()-t0:.1f}s", flush=True)

from mcpt_tpu.render.camera import generate_rays


R = 65536
W = H = 256
pixel_idx = jnp.arange(R, dtype=jnp.int32)
key = jax.random.PRNGKey(0)
import dataclasses as dc
cam = dc.replace(scene.camera, width=W, height=H)
jitter = jax.random.uniform(key, (R, 2))
org, dirn = generate_rays(cam, jitter, pixel_idx)

kr = jax.random.normal(key, (R, 3))
rand_d = kr / jnp.linalg.norm(kr, axis=1, keepdims=True)
rand_o = jnp.broadcast_to(scene.camera.eye, (R, 3))

def bench(fn, name, o, d, n=3):
    try:
        t0 = time.perf_counter()
        out = fn(o, d)
        jax.tree.map(np.asarray, out)
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(o, d)
        jax.tree.map(np.asarray, out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: compile {c:.1f}s, {R/dt/1e6:.2f} Mrays/s", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

from mcpt_tpu.ops.blocks import closest_hit_blocks, any_hit_blocks
from mcpt_tpu.ops.pallas.traverse import closest_hit_treelets

bench(lambda o, d: closest_hit_blocks(scene, o, d), "blocks/coherent", org, dirn)
bench(lambda o, d: closest_hit_blocks(scene, o, d), "blocks/random", rand_o, rand_d)
bench(lambda o, d: closest_hit_treelets(scene, o, d, ray_tile=256), "treelets256/coherent", org, dirn)
bench(lambda o, d: any_hit_blocks(scene, o, d, t_max=jnp.full((R,), 1e3)), "blocks-any/coherent", org, dirn)
