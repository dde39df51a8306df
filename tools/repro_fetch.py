"""Repro: kernel execution + host fetch in a loop; find when it wedges.

Usage: python tools/repro_fetch.py [n_iters] [mode]
  mode: kernel (default) | brute | mix
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/mcpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from mcpt_tpu.ops.bvh import build_bvh_arrays
from mcpt_tpu.ops.intersect import closest_hit_bruteforce
from mcpt_tpu.ops.pallas.traverse import closest_hit_treelets
from mcpt_tpu.ops.treelets import build_treelets
from mcpt_tpu.scene import Geometry, Scene

class F:
    def __init__(s, t): s.treelets = t

def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    mode = sys.argv[2] if len(sys.argv) > 2 else "kernel"
    T = 20000
    print("device:", jax.devices()[0], "mode:", mode, flush=True)
    rng = np.random.default_rng(0)
    base = rng.uniform(-5, 5, (T, 3))
    e1 = rng.normal(size=(T, 3)) * 0.3
    e2 = rng.normal(size=(T, 3)) * 0.3
    nodes, perm = build_bvh_arrays(base, e1, e2)
    v0, e1, e2 = base[perm], e1[perm], e2[perm]
    ts = build_treelets(v0, e1, e2, nodes)
    fake = F(ts)
    g = Geometry(v0=jnp.asarray(v0, jnp.float32), e1=jnp.asarray(e1, jnp.float32),
                 e2=jnp.asarray(e2, jnp.float32), vn=jnp.zeros((T,3,3), jnp.float32),
                 uv=jnp.zeros((T,3,2), jnp.float32), mat_id=jnp.zeros((T,), jnp.int32),
                 area=jnp.ones((T,), jnp.float32))
    dense = Scene(geom=g, mats=None, atlas=None, light_tris=None, camera=None)
    o = jnp.asarray(rng.uniform(-6, 6, (1024, 3)), jnp.float32)
    d = rng.normal(size=(1024, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)

    for i in range(n):
        t0 = time.perf_counter()
        if mode == "kernel" or (mode == "mix" and i % 2 == 0):
            h = closest_hit_treelets(fake, o, d)
            v = np.asarray(h.tri)  # host fetch
            tag = "kernel"
        else:
            h = closest_hit_bruteforce(dense, o, d)
            v = np.asarray(h.tri)
            tag = "brute"
        print(f"{i:3d} {tag} fetched sum={int((v>=0).sum())}  {time.perf_counter()-t0:.2f}s", flush=True)
    print("SURVIVED", flush=True)

if __name__ == "__main__":
    main()
