"""Traversal-only throughput (the round-1 failure mode) + threshold sweep.

Usage: python tools/bench_traverse.py [scene.obj] [--rays N] [--algo auto|treelets|bvh|dense]
       python tools/bench_traverse.py --sweep   # dense-vs-treelet crossover

Measures scene load time, then steady-state closest_hit and any_hit Mrays/s
on camera-like ray batches (primary rays + scrambled rays to mimic bounce
divergence). --sweep times both paths on synthetic soups of growing size to
justify ops/intersect.TREELET_MIN_TRIS by measurement.
"""
import argparse
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf)  # host readback = true device sync through the relay
    return out


def _time_fn(fn, o, d, n=5):
    t0 = time.perf_counter()
    _sync(fn(o, d))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(o, d)
    _sync(out)
    return (time.perf_counter() - t0) / n, t_compile, out


def sweep():
    """Dense (Woop XLA) vs treelet kernel on synthetic soups: find the
    crossover triangle count that justifies TREELET_MIN_TRIS."""
    import jax.numpy as jnp

    from mcpt_tpu.ops.bvh import build_bvh_arrays
    from mcpt_tpu.ops.intersect import closest_hit_woop
    from mcpt_tpu.ops.pallas.traverse import closest_hit_treelets
    from mcpt_tpu.ops.treelets import build_treelets
    from mcpt_tpu.scene import Geometry, Scene, permute_scene_tris

    rng = np.random.default_rng(7)
    R = 32768
    o = rng.uniform(-6, 6, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    print(f"{'tris':>6} {'dense ms':>9} {'treelet ms':>11}  winner")
    for T in (128, 256, 512, 1024, 2048, 4096, 8192):
        base = rng.uniform(-5, 5, (T, 3))
        e1 = rng.normal(size=(T, 3)) * 0.5
        e2 = rng.normal(size=(T, 3)) * 0.5
        geom = Geometry(
            v0=jnp.asarray(base, jnp.float32), e1=jnp.asarray(e1, jnp.float32),
            e2=jnp.asarray(e2, jnp.float32),
            vn=jnp.zeros((T, 3, 3), jnp.float32),
            uv=jnp.zeros((T, 3, 2), jnp.float32),
            mat_id=jnp.zeros((T,), jnp.int32), area=jnp.ones((T,), jnp.float32),
        )
        from mcpt_tpu.scene import Materials, TextureAtlas, Camera

        sc = Scene(
            geom=geom,
            mats=Materials(
                kd=jnp.ones((1, 3)), ks=jnp.zeros((1, 3)), ns=jnp.ones((1,)),
                radiance=jnp.zeros((1, 3)),
                tex_id=jnp.full((1,), -1, jnp.int32), tr=jnp.zeros((1, 3)),
                ni=jnp.ones((1,)),
            ),
            atlas=TextureAtlas(data=jnp.zeros((1, 1, 1, 3)),
                               size=jnp.ones((1, 2), jnp.int32)),
            light_tris=jnp.zeros((0,), jnp.int32),
            camera=Camera(eye=jnp.zeros(3), lookat=jnp.ones(3),
                          up=jnp.array([0.0, 1.0, 0.0]),
                          fovy=jnp.asarray(40.0)),
        )
        nodes, perm = build_bvh_arrays(
            np.asarray(base, np.float64), np.asarray(e1, np.float64),
            np.asarray(e2, np.float64), use_native=False,
        )
        sc = permute_scene_tris(sc, perm)
        ts = build_treelets(sc.geom.v0, sc.geom.e1, sc.geom.e2, nodes)
        import dataclasses as dc

        sc = dc.replace(sc, treelets=ts)

        import jax

        # jit both: unjitted calls eager-dispatch per op through the relay
        dt_d, _, _ = _time_fn(
            jax.jit(lambda oo, dd: closest_hit_woop(sc, oo, dd)), o, d
        )
        dt_t, _, _ = _time_fn(
            jax.jit(lambda oo, dd: closest_hit_treelets(sc, oo, dd)), o, d
        )
        win = "treelets" if dt_t < dt_d else "dense"
        print(f"{T:>6} {dt_d*1e3:>9.2f} {dt_t*1e3:>11.2f}  {win}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="scenes/bathroom-stress.obj")
    ap.add_argument("--rays", type=int, default=32768)
    ap.add_argument("--algo", default="auto",
                    choices=["auto", "treelets", "bvh", "dense"])
    ap.add_argument("--ray-tile", type=int, default=None)
    ap.add_argument("--no-sort", action="store_true")
    ap.add_argument("--sweep", action="store_true",
                    help="dense-vs-treelet crossover on synthetic soups")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0])
    if args.sweep:
        sweep()
        return

    t0 = time.perf_counter()
    from mcpt_tpu.io.obj import load_scene

    scene = load_scene(args.scene, with_bvh=True)
    jax.block_until_ready(scene.geom.v0)
    t_load = time.perf_counter() - t0
    print(f"load_scene: {t_load:.2f}s  tris={scene.num_tris}", flush=True)
    if scene.treelets is not None:
        ts = scene.treelets
        print(f"treelets: NS={ts.ns} S_B={ts.s_b} C={ts.c}")

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
    if args.ray_tile:
        kw["ray_tile"] = args.ray_tile
    if args.no_sort:
        kw["sort_rays"] = False

    if args.algo == "treelets":
        from mcpt_tpu.ops.pallas.traverse import (
            any_hit_treelets,
            closest_hit_treelets,
        )

        ch = lambda o, d, **k2: closest_hit_treelets(scene, o, d, **kw, **k2)
        ah = lambda o, d, **k2: any_hit_treelets(scene, o, d, **kw, **k2)
    elif args.algo == "bvh":
        from mcpt_tpu.ops.traverse import any_hit_bvh, closest_hit_bvh

        ch = lambda o, d, **k2: closest_hit_bvh(scene, o, d, **k2)
        ah = lambda o, d, **k2: any_hit_bvh(scene, o, d, **k2)
    elif args.algo == "dense":
        from mcpt_tpu.ops.intersect import any_hit_woop, closest_hit_woop

        ch = lambda o, d, **k2: closest_hit_woop(scene, o, d, **k2)
        ah = lambda o, d, **k2: any_hit_woop(scene, o, d, **k2)
    else:
        from mcpt_tpu.ops.intersect import any_hit, closest_hit

        ch = lambda o, d, **k2: closest_hit(scene, o, d, **k2)
        ah = lambda o, d, **k2: any_hit(scene, o, d, **k2)

    # jit everything: unjitted calls eager-dispatch per op through the relay
    ch = jax.jit(ch)
    ah = jax.jit(ah)

    # realistic shadow rays: from primary hit points toward one light
    # triangle, t_max = distance (the integrator's NEE any-hit pattern)
    hit0 = ch(org, dirn)
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
        dt, t_compile, out = _time_fn(partial(fn, **k2), o, d)
        hits = None
        if hasattr(out, "tri"):
            hits = float((np.asarray(out.tri) >= 0).mean())
        print(
            f"{name}: {dt*1e3:8.2f} ms  {R/dt/1e6:8.2f} Mrays/s  "
            f"(first={t_compile:.1f}s"
            + (f", hit-rate={hits:.3f}" if hits is not None else "")
            + ")",
            flush=True,
        )


if __name__ == "__main__":
    main()
