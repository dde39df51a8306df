"""Traversal-only throughput on a large scene (the round-1 failure mode).

Usage: python tools/bench_traverse.py [scene.obj] [--rays N] [--algo blocks|bvh]

Measures scene load time, block build, then steady-state closest_hit and
any_hit Mrays/s on camera-like ray batches (primary rays + scrambled rays to
mimic bounce divergence).
"""
import argparse
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="scenes/bathroom-stress.obj")
    ap.add_argument("--rays", type=int, default=32768)
    ap.add_argument("--algo", default="blocks", choices=["blocks", "bvh", "auto"])
    ap.add_argument("--G", type=int, default=None)
    ap.add_argument("--K", type=int, default=None)
    ap.add_argument("--block-c", type=int, default=None)
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--no-sort", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0])

    t0 = time.perf_counter()
    from mcpt_tpu.io.obj import load_scene

    if args.block_c:
        import mcpt_tpu.ops.blocks as B

        B.DEFAULT_BLOCK_C = args.block_c
    scene = load_scene(args.scene, with_bvh=True)
    jax.block_until_ready(scene.geom.v0)
    t_load = time.perf_counter() - t0
    print(f"load_scene: {t_load:.2f}s  tris={scene.num_tris}", flush=True)
    if scene.blocks is not None:
        print(f"blocks: L={scene.blocks.n_blocks} C={scene.blocks.block_c}")

    from mcpt_tpu.render.camera import generate_rays
    from mcpt_tpu.utils.rng import per_ray_keys, ray_uniforms

    cam = scene.camera
    R = args.rays
    key = jax.random.PRNGKey(0)
    pidx = jnp.arange(R, dtype=jnp.int32)  # first rows of the image
    keys = per_ray_keys(key, pidx)
    jitter = ray_uniforms(keys, 0, 2)
    org, dirn = generate_rays(cam, jitter, pidx)

    # scrambled = divergence stress (random pixels over the whole image)
    rng = np.random.default_rng(0)
    pidx2 = jnp.asarray(
        rng.integers(0, cam.width * cam.height, R), jnp.int32
    )
    keys2 = per_ray_keys(key, pidx2)
    org2, dirn2 = generate_rays(cam, ray_uniforms(keys2, 0, 2), pidx2)

    kw = {}
    if args.G:
        kw["G"] = args.G
    if args.K:
        kw["K"] = args.K
    if args.pallas:
        kw["use_topk_pallas"] = True
    if args.no_pallas:
        kw["use_topk_pallas"] = False
    if args.no_sort:
        kw["sort_rays"] = False

    if args.algo == "blocks":
        from mcpt_tpu.ops.blocks import any_hit_blocks, closest_hit_blocks

        ch = lambda o, d, **k2: closest_hit_blocks(
            scene, o, d, with_stats=True, **kw, **k2
        )
        ah = lambda o, d, **k2: any_hit_blocks(
            scene, o, d, with_stats=True, **kw, **k2
        )
    elif args.algo == "bvh":
        from mcpt_tpu.ops.traverse import any_hit_bvh, closest_hit_bvh

        ch = lambda o, d, **k2: closest_hit_bvh(scene, o, d, **k2)
        ah = lambda o, d, **k2: any_hit_bvh(scene, o, d, **k2)
    else:
        from mcpt_tpu.ops.intersect import any_hit, closest_hit

        ch = lambda o, d, **k2: closest_hit(scene, o, d, **k2)
        ah = lambda o, d, **k2: any_hit(scene, o, d, **k2)

    # realistic shadow rays: from primary hit points toward one light
    # triangle, t_max = distance (the integrator's NEE any-hit pattern)
    hit0 = ch(org, dirn)
    hit0 = hit0[0] if isinstance(hit0, tuple) else hit0
    t0h = jnp.minimum(hit0.t, 1e3)
    p_hit = org + dirn * (t0h[:, None] * 0.999)
    if scene.num_lights > 0:
        lt = int(np.asarray(scene.light_tris)[0])
        target = np.asarray(scene.geom.v0)[lt]
    else:
        target = np.asarray(scene.camera.lookat)
    to_l = jnp.asarray(target)[None, :] - p_hit
    dist = jnp.linalg.norm(to_l, axis=1)
    d_sh = to_l / dist[:, None]

    for name, fn, (o, d), k2 in [
        ("closest/primary", ch, (org, dirn), {}),
        ("closest/scrambled", ch, (org2, dirn2), {}),
        ("anyhit/shadow", ah, (p_hit, d_sh), {"t_max": dist - 1e-3}),
        ("anyhit/primary", ah, (org, dirn), {}),
    ]:
        fn = partial(fn, **k2)
        # true device sync is a host readback: block_until_ready is
        # unreliable through the remote-TPU relay (see bench.py)
        def sync(out):
            leaf = jax.tree_util.tree_leaves(out)[-1]
            np.asarray(leaf)
            return out

        t0 = time.perf_counter()
        out = sync(fn(o, d))
        t_compile = time.perf_counter() - t0
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(o, d)
        sync(out)
        dt = (time.perf_counter() - t0) / n
        nwaves = None
        if isinstance(out, tuple):
            out, nwaves = out
            nwaves = int(nwaves)
        hits = None
        if hasattr(out, "tri"):
            hits = float((np.asarray(out.tri) >= 0).mean())
        print(
            f"{name}: {dt*1e3:8.2f} ms  {R/dt/1e6:8.2f} Mrays/s  "
            f"(first={t_compile:.1f}s"
            + (f", hit-rate={hits:.3f}" if hits is not None else "")
            + (f", waves={nwaves}" if nwaves is not None else "")
            + ")",
            flush=True,
        )


if __name__ == "__main__":
    main()
