"""Isolate the device fault: run a sequence of programs and report which dies.

Sequence: matmul -> pallas kernel (R=1024) -> matmul -> kernel (R=2048,
recompile) -> small bruteforce -> matmul -> kernel again.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mcpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from mcpt_tpu.ops.bvh import build_bvh_arrays
from mcpt_tpu.ops.intersect import closest_hit_bruteforce
from mcpt_tpu.ops.pallas.traverse import closest_hit_treelets
from mcpt_tpu.ops.treelets import build_treelets


class FakeScene:
    def __init__(self, ts):
        self.treelets = ts


def step(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"OK   {name}  {time.perf_counter()-t0:.2f}s", flush=True)
        return out
    except Exception as e:
        print(f"DIED {name}  {time.perf_counter()-t0:.2f}s: {type(e).__name__} {str(e)[:200]}", flush=True)
        sys.exit(1)


def main():
    T = 20000
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    base = rng.uniform(-5, 5, (T, 3))
    e1 = rng.normal(size=(T, 3)) * 0.3
    e2 = rng.normal(size=(T, 3)) * 0.3
    nodes, perm = build_bvh_arrays(base, e1, e2)
    v0, e1, e2 = base[perm], e1[perm], e2[perm]
    ts = build_treelets(v0, e1, e2, nodes)
    fake = FakeScene(ts)

    def rays(R, seed):
        r = np.random.default_rng(seed)
        o = jnp.asarray(r.uniform(-6, 6, (R, 3)), jnp.float32)
        d = r.normal(size=(R, 3))
        d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
        return o, d

    x = jnp.asarray(rng.standard_normal((512, 512)), jnp.float32)
    step("matmul-1", lambda: x @ x)
    o1, d1 = rays(1024, 1)
    h1 = step("kernel-1024 (compile)", lambda: closest_hit_treelets(fake, o1, d1).t)
    for i in range(5):
        step(f"kernel-1024 rerun {i}", lambda: closest_hit_treelets(fake, o1, d1).t)
    step("matmul-2", lambda: x @ x)
    o2, d2 = rays(2048, 2)
    step("kernel-2048 (recompile)", lambda: closest_hit_treelets(fake, o2, d2).t)

    from mcpt_tpu.scene import Geometry, Scene

    g = Geometry(
        v0=jnp.asarray(v0, jnp.float32), e1=jnp.asarray(e1, jnp.float32),
        e2=jnp.asarray(e2, jnp.float32),
        vn=jnp.zeros((T, 3, 3), jnp.float32),
        uv=jnp.zeros((T, 3, 2), jnp.float32),
        mat_id=jnp.zeros((T,), jnp.int32), area=jnp.ones((T,), jnp.float32),
    )
    dense = Scene(geom=g, mats=None, atlas=None, light_tris=None, camera=None)
    ref = step("bruteforce-1024", lambda: closest_hit_bruteforce(dense, o1, d1).tri)
    step("matmul-3", lambda: x @ x)
    h1b = step("kernel-1024 again", lambda: closest_hit_treelets(fake, o1, d1))
    same = np.asarray(ref) == np.asarray(h1b.tri)
    print(f"match vs bruteforce: {same.mean()*100:.3f}% ({(~same).sum()}/1024 diff)")


if __name__ == "__main__":
    main()
