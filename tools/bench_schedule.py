"""Correctness + throughput: schedule-fed kernel vs the voted treelet kernel.

Compares closest/any results on mixed ray batches (exact match required —
both kernels implement the identical accept predicate + tie break) and
times both on the bathroom stress, including the schedule pre-pass.

Run: timeout 900 python tools/bench_schedule.py [--scene scenes/bathroom-stress.obj]
         [--rays 32768] [--tile 128] [--v 512] [--reps 5] [--mode all]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mcpt_jax_cache")


def make_batches(scene, R, rng):
    """(primary-like, scrambled) ray batches inside the scene bounds."""
    ts = scene.treelets
    sb = np.asarray(ts.sb_box)
    valid = sb[6] > 0
    lo = sb[0:3, valid].min(axis=1)
    hi = sb[3:6, valid].max(axis=1)
    ctr = (lo + hi) / 2
    ext = hi - lo

    cam = scene.camera
    eye = np.asarray(cam.eye, np.float32)
    o1 = np.broadcast_to(eye, (R, 3)).copy()
    tgt = ctr[None, :] + (rng.uniform(-0.5, 0.5, (R, 3)) * ext[None, :])
    d1 = tgt - o1
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)

    o2 = ctr[None, :] + rng.uniform(-0.6, 0.6, (R, 3)) * ext[None, :]
    d2 = rng.normal(size=(R, 3))
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    return (
        (jnp.asarray(o1, jnp.float32), jnp.asarray(d1, jnp.float32)),
        (jnp.asarray(o2, jnp.float32), jnp.asarray(d2, jnp.float32)),
    )


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])
    return x


def timeit(fn, reps):
    sync(fn())
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="scenes/bathroom-stress.obj")
    ap.add_argument("--rays", type=int, default=32768)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--v", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--mode", default="all", choices=["all", "correct", "perf"])
    args = ap.parse_args()

    from mcpt_tpu.io.obj import load_scene
    from mcpt_tpu.ops.pallas.schedule import (
        any_hit_schedule,
        build_schedule,
        closest_hit_schedule,
    )
    from mcpt_tpu.ops.pallas.traverse import (
        _pack_rays,
        any_hit_treelets,
        closest_hit_treelets,
    )

    t0 = time.perf_counter()
    scene = load_scene(args.scene, with_bvh=True)
    print(f"scene {args.scene}: {scene.num_tris} tris "
          f"(load {time.perf_counter() - t0:.1f}s)", flush=True)
    rng = np.random.default_rng(42)
    (o1, d1), (o2, d2) = make_batches(scene, args.rays, rng)

    for name, (o, d) in (("primary", (o1, d1)), ("scrambled", (o2, d2))):
        if args.mode in ("all", "correct"):
            h_old = closest_hit_treelets(scene, o, d, sort_rays=True)
            h_new = closest_hit_schedule(scene, o, d, ray_tile=args.tile,
                                         v=args.v)
            t_old = np.asarray(h_old.t)
            t_new = np.asarray(h_new.t)
            id_old = np.asarray(h_old.tri)
            id_new = np.asarray(h_new.tri)
            n_mism = int((id_old != id_new).sum())
            n_tmis = int((t_old != t_new).sum())
            a_old = np.asarray(any_hit_treelets(scene, o, d, t_max=30.0))
            a_new = np.asarray(any_hit_schedule(scene, o, d, t_max=30.0,
                                                ray_tile=args.tile, v=args.v))
            n_amis = int((a_old != a_new).sum())
            hit_rate = float((id_new >= 0).mean())
            print(f"[{name}] closest id mismatches {n_mism}, t mismatches "
                  f"{n_tmis}, any mismatches {n_amis}, hit rate "
                  f"{hit_rate:.3f}", flush=True)

        if args.mode in ("all", "perf"):
            reps = args.reps
            dt_old = timeit(lambda: closest_hit_treelets(scene, o, d), reps)
            dt_new = timeit(
                lambda: closest_hit_schedule(scene, o, d, ray_tile=args.tile,
                                             v=args.v), reps)
            da_old = timeit(lambda: any_hit_treelets(scene, o, d, t_max=30.0),
                            reps)
            da_new = timeit(
                lambda: any_hit_schedule(scene, o, d, t_max=30.0,
                                         ray_tile=args.tile, v=args.v), reps)
            R = args.rays
            print(f"[{name}] closest: voted {dt_old*1e3:7.2f} ms "
                  f"({R/dt_old/1e6:5.2f} Mr/s)  sched {dt_new*1e3:7.2f} ms "
                  f"({R/dt_new/1e6:5.2f} Mr/s)  x{dt_old/dt_new:.2f}")
            print(f"[{name}] any:     voted {da_old*1e3:7.2f} ms "
                  f"({R/da_old/1e6:5.2f} Mr/s)  sched {da_new*1e3:7.2f} ms "
                  f"({R/da_new/1e6:5.2f} Mr/s)  x{da_old/da_new:.2f}",
                  flush=True)

        # schedule statistics (union quality + truncation rate)
        from mcpt_tpu.ops.pallas.traverse import _ray_sort_order

        order = _ray_sort_order(scene.treelets, o, d)
        tM = jnp.full((args.rays,), 1e30, jnp.float32)
        rays, _, _ = _pack_rays(o[order], d[order], 1e-4, tM[order], args.tile)
        if args.mode in ("all", "perf"):
            dt_pre = timeit(
                lambda: build_schedule(scene.treelets, rays, args.tile,
                                       args.v), args.reps)
            print(f"[{name}] pre-pass (slab+sort+pack): {dt_pre*1e3:.2f} ms")
        _, incomplete, n_live = build_schedule(scene.treelets, rays,
                                               args.tile, args.v)
        nl = np.asarray(n_live)
        print(f"[{name}] schedule live/tile: mean {nl.mean():.0f} "
              f"p50 {np.percentile(nl, 50):.0f} p99 {np.percentile(nl, 99):.0f} "
              f"max {nl.max()}  truncated tiles "
              f"{int(np.asarray(incomplete).sum())}/{len(nl)}", flush=True)


if __name__ == "__main__":
    main()
