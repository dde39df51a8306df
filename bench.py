#!/usr/bin/env python
"""Benchmark: cornell-box 1024x1024, 64 spp on the attached TPU chip.

Prints ONE JSON line:
  {"metric": "Mrays/s/chip", "value": N, "unit": "Mrays/s", "vs_baseline": X}

Ray accounting is honest traced work: 1 primary ray per sample plus
(1 path + 1 shadow) ray per active bounce, measured on-device by the
integrator's instrumented counters — not max_bounces * R. `vs_baseline`
is value / 100 (the BASELINE.json north-star target of 100 Mrays/s/chip;
the reference CPU records no quantitative number, SURVEY §6).

Usage: python bench.py [--width 1024] [--height 1024] [--spp 64]
                       [--scene scenes/cornell-box.obj] [--bounces 24]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="scenes/cornell-box.obj")
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--bounces", type=int, default=24)
    ap.add_argument("--spp-per-pass", type=int, default=64)
    ap.add_argument("--save", default=None, help="optionally save the PNG")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mcpt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np

    from mcpt_tpu.io.obj import load_scene
    from mcpt_tpu.render.renderer import RenderConfig, Renderer

    scene = load_scene(args.scene, with_bvh=True)
    dev = jax.devices()[0]
    sys.stderr.write(f"[bench] device: {dev}, scene tris: {scene.num_tris}\n")

    r = Renderer(
        scene,
        RenderConfig(
            max_bounces=args.bounces,
            width=args.width,
            height=args.height,
            spp_per_pass=args.spp_per_pass,
            seed=0,
        ),
    )

    # warmup + compile (ray counts accumulate on-device in film.rays)
    r.step()
    rays_before = float(r.film.rays)
    n_passes = max(1, args.spp // args.spp_per_pass - 1)
    t0 = time.perf_counter()
    for _ in range(n_passes):
        r.step()
    # true device sync: host readback (block_until_ready is unreliable
    # through the remote-TPU relay)
    total_rays = float(r.film.rays) - rays_before
    dt = time.perf_counter() - t0

    mrays = total_rays / dt / 1e6
    time_to_image = (args.spp / args.spp_per_pass) * (dt / n_passes)
    sys.stderr.write(
        f"[bench] {n_passes} passes in {dt:.3f}s "
        f"({dt / n_passes * 1e3:.1f} ms/pass, {mrays:.1f} Mrays/s, "
        f"time-to-image {time_to_image:.2f}s @ {args.spp}spp, "
        f"nan={int(r.film.nan_count)})\n"
    )
    if args.save:
        r.save(args.save)

    print(
        json.dumps(
            {
                "metric": "Mrays/s/chip",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
