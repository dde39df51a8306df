"""Probe Pallas treelet traversal ray-tile sizes on the real TPU.

Finds the largest ray_tile whose scoped-VMEM footprint compiles, and
measures steady-state Mrays/s for closest_hit at each size.
"""
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
ts = scene.treelets
print(f"treelets: sb_box {ts.sb_box.shape} blk_box {ts.blk_box.shape} tri {ts.tri.shape}", flush=True)

from mcpt_tpu.ops.pallas.traverse import closest_hit_treelets

R = 65536
key = jax.random.PRNGKey(0)
# camera-ish rays: origin at camera eye, random directions
eye = jnp.broadcast_to(scene.camera.eye, (R, 3))
d = jax.random.normal(key, (R, 3))
d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

for tile in [256, 512, 1024]:
    try:
        t0 = time.perf_counter()
        h = closest_hit_treelets(scene, eye, d, ray_tile=tile)
        np.asarray(h.t)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            h = closest_hit_treelets(scene, eye, d, ray_tile=tile)
        np.asarray(h.t)
        dt = (time.perf_counter() - t0) / n
        print(f"tile={tile}: compile {compile_s:.1f}s, {R/dt/1e6:.2f} Mrays/s, hitrate {float(jnp.mean(h.valid)):.3f}", flush=True)
    except Exception as e:
        print(f"tile={tile}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
