"""On-chip smoke test of the Pallas treelet traversal vs brute force.

Run: python tools/smoke_treelets.py [T] [R]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mcpt_tpu.ops.bvh import build_bvh_arrays
from mcpt_tpu.ops.intersect import (
    any_hit_bruteforce,
    closest_hit_bruteforce,
)
from mcpt_tpu.ops.pallas.traverse import (
    any_hit_treelets,
    closest_hit_treelets,
)
from mcpt_tpu.ops.treelets import build_treelets


class FakeScene:
    def __init__(self, ts):
        self.treelets = ts


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    base = rng.uniform(-5, 5, (T, 3))
    e1 = rng.normal(size=(T, 3)) * 0.3
    e2 = rng.normal(size=(T, 3)) * 0.3
    nodes, perm = build_bvh_arrays(base, e1, e2)
    v0, e1, e2 = base[perm], e1[perm], e2[perm]
    t0 = time.perf_counter()
    ts = build_treelets(v0, e1, e2, nodes)
    print(f"treelet build: {time.perf_counter()-t0:.2f}s "
          f"ns={ts.ns} s_b={ts.s_b} c={ts.c} tri_hbm={ts.tri.nbytes/1e6:.0f}MB")

    o = jnp.asarray(rng.uniform(-6, 6, (R, 3)), jnp.float32)
    d = rng.normal(size=(R, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)

    from mcpt_tpu.scene import Geometry, Scene

    g = Geometry(
        v0=jnp.asarray(v0, jnp.float32), e1=jnp.asarray(e1, jnp.float32),
        e2=jnp.asarray(e2, jnp.float32),
        vn=jnp.zeros((T, 3, 3), jnp.float32),
        uv=jnp.zeros((T, 3, 2), jnp.float32),
        mat_id=jnp.zeros((T,), jnp.int32), area=jnp.ones((T,), jnp.float32),
    )
    dense = Scene(geom=g, mats=None, atlas=None, light_tris=None, camera=None)
    fake = FakeScene(ts)

    # reference FIRST, fully materialized, so a later device fault can be
    # attributed to the kernel
    t0 = time.perf_counter()
    ref = closest_hit_bruteforce(dense, o, d)
    ref_tri = np.asarray(ref.tri)
    print(f"bruteforce ref done: {time.perf_counter()-t0:.1f}s "
          f"hit-rate={np.mean(ref_tri >= 0):.3f}")
    t_max = jnp.asarray(rng.uniform(0.5, 8.0, R), jnp.float32)
    ra = np.asarray(any_hit_bruteforce(dense, o, d, t_max=t_max))

    t0 = time.perf_counter()
    got = closest_hit_treelets(fake, o, d, interpret=False)
    jax.block_until_ready(got.t)
    print(f"kernel first call (compile+run): {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        got = closest_hit_treelets(fake, o, d, interpret=False)
    jax.block_until_ready(got.t)
    dt = (time.perf_counter() - t0) / n
    print(f"closest: {dt*1e3:.2f} ms  {R/dt/1e6:.2f} Mrays/s")

    same = ref_tri == np.asarray(got.tri)
    print(f"closest match: {same.mean()*100:.3f}%  ({(~same).sum()} diff)")

    t0 = time.perf_counter()
    ga = any_hit_treelets(fake, o, d, t_max=t_max, interpret=False)
    jax.block_until_ready(ga)
    print(f"any first call: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(n):
        ga = any_hit_treelets(fake, o, d, t_max=t_max, interpret=False)
    jax.block_until_ready(ga)
    dt = (time.perf_counter() - t0) / n
    print(f"any: {dt*1e3:.2f} ms  {R/dt/1e6:.2f} Mrays/s")
    same = ra == np.asarray(ga)
    print(f"any match: {same.mean()*100:.3f}%  ({(~same).sum()} diff)")


if __name__ == "__main__":
    main()
