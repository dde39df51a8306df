"""Sweep treelet (c, s_b) shapes + ray tiles for the Pallas traversal on TPU."""
import dataclasses as dc
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mcpt_tpu.io.obj import load_scene
from mcpt_tpu.ops.treelets import build_treelets
from mcpt_tpu.ops.pallas.traverse import closest_hit_treelets

scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/bathroom-stress.obj"
t0 = time.perf_counter()
scene = load_scene(scene_path, with_bvh=True)
print(f"loaded {scene.num_tris} tris in {time.perf_counter()-t0:.1f}s", flush=True)

nodes = {
    "lo": np.asarray(scene.bvh.lo),
    "hi": np.asarray(scene.bvh.hi),
    "first": np.asarray(scene.bvh.first),
    "count": np.asarray(scene.bvh.count),
    "skip": np.asarray(scene.bvh.skip),
}

from mcpt_tpu.render.camera import generate_rays

R = 65536
W = H = 256
key = jax.random.PRNGKey(0)
cam = dc.replace(scene.camera, width=W, height=H)
jitter = jax.random.uniform(key, (R, 2))
org, dirn = generate_rays(cam, jitter, jnp.arange(R, dtype=jnp.int32))

kr = jax.random.normal(key, (R, 3))
rand_d = kr / jnp.linalg.norm(kr, axis=1, keepdims=True)
rand_o = jnp.broadcast_to(scene.camera.eye, (R, 3))

v0 = np.asarray(scene.geom.v0)
e1 = np.asarray(scene.geom.e1)
e2 = np.asarray(scene.geom.e2)

ref = None
for (c, s_b) in [(128, 128), (256, 64), (256, 128), (512, 64)]:
    t0 = time.perf_counter()
    ts = build_treelets(v0, e1, e2, nodes, c=c, s_b=s_b)
    build_s = time.perf_counter() - t0
    sc = dc.replace(scene, treelets=ts)
    for tile in (256, 512):
        try:
            t0 = time.perf_counter()
            h = closest_hit_treelets(sc, org, dirn, ray_tile=tile)
            tt = np.asarray(h.t)
            ii = np.asarray(h.tri)
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            n = 3
            for _ in range(n):
                h = closest_hit_treelets(sc, org, dirn, ray_tile=tile)
            np.asarray(h.t)
            dt = (time.perf_counter() - t0) / n
            h2 = closest_hit_treelets(sc, rand_o, rand_d, ray_tile=tile)
            np.asarray(h2.t)
            t0 = time.perf_counter()
            for _ in range(n):
                h2 = closest_hit_treelets(sc, rand_o, rand_d, ray_tile=tile)
            np.asarray(h2.t)
            dtr = (time.perf_counter() - t0) / n
            if ref is None:
                ref = (tt, ii)
            agree = float(np.mean(ref[1] == ii))
            print(
                f"c={c} s_b={s_b} tile={tile}: build {build_s:.1f}s "
                f"compile {comp:.1f}s coherent {R/dt/1e6:.2f} Mrays/s "
                f"random {R/dtr/1e6:.2f} Mrays/s agree={agree:.4f}",
                flush=True,
            )
        except Exception as e:
            print(f"c={c} s_b={s_b} tile={tile}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
