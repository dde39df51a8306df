"""Profile the pipelined wavefront's P (trace) and X (shade) programs
separately on a treelet scene: aggregate device SELF time per op over a
few steady-state iterations of each.

Usage: python tools/profile_split.py [scene] [--chunk N] [--spp N] [--top N]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_trace(trace_dir, top):
    traces = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    with gzip.open(traces[-1]) as f:
        d = json.load(f)
    ev = d["traceEvents"]
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in (n or "")}
    tid_names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    tracks = collections.defaultdict(list)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            if "Modules" in tid_names.get((e["pid"], e.get("tid")), ""):
                continue
            tracks[(e["pid"], e.get("tid"))].append((e["ts"], -e["dur"], e["name"]))
    tot = collections.Counter()
    total = 0.0
    for track in tracks.values():
        track.sort()
        stack = []

        def flush(fr):
            nonlocal total
            _end, name, child, _ts, dur = fr
            self_t = max(dur - child, 0.0)
            tot[name] += self_t
            total += self_t

        for ts, ndur, name in track:
            dur = -ndur
            while stack and stack[-1][0] <= ts:
                flush(stack.pop())
            fr = [ts + dur, name, 0.0, ts, dur]
            if stack:
                stack[-1][2] += dur
            stack.append(fr)
        while stack:
            flush(stack.pop())
    print(f"  device total {total / 1e3:.1f} ms")
    for name, us in tot.most_common(top):
        print(f"  {us / 1e3:9.2f} ms  {100 * us / max(total, 1):5.1f}%  {name}")
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="scenes/bathroom-stress.obj")
    ap.add_argument("--chunk", type=int, default=131072)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--bounces", type=int, default=24)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--warm", type=int, default=6)
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mcpt_jax_cache")
    from mcpt_tpu.io.obj import load_scene
    from mcpt_tpu.render.integrator import split_state0
    from mcpt_tpu.render.renderer import _split_shade_jit, _split_trace_jit

    scene = load_scene(args.scene, with_bvh=True)
    R = args.chunk
    pidx = jnp.arange(R, dtype=jnp.int32)
    lv = jnp.ones((R,), bool)
    key = jax.random.PRNGKey(0)
    start = jnp.asarray(0, jnp.int32)
    spp, mb = args.spp, args.bounces

    st = split_state0(R, spp, lv)
    miss = (jnp.full((R,), np.finfo(np.float32).max), jnp.full((R,), -1, jnp.int32),
            jnp.zeros((R,)), jnp.zeros((R,)), jnp.zeros((R,), bool))
    st, _ = _split_shade_jit(scene, st, *miss, key, pidx, start, spp, mb)

    def step(st):
        hit = _split_trace_jit(scene, st["o"], st["d"], st["so"], st["sd"], st["smax"])
        st, npend = _split_shade_jit(scene, st, *hit, key, pidx, start, spp, mb)
        return st, npend

    for _ in range(args.warm):
        st, npend = step(st)
    np.asarray(npend)

    # trace P-only iterations, then X-only (alternating in one capture,
    # attributing by module name is messy — capture both, the op names
    # distinguish them anyway)
    d = "/tmp/mcpt_split_profile"
    os.makedirs(d, exist_ok=True)
    t0 = time.perf_counter()
    jax.profiler.start_trace(d)
    for _ in range(args.iters):
        st, npend = step(st)
    np.asarray(npend)
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0
    print(f"{args.iters} iters in {wall * 1e3:.0f} ms = "
          f"{wall / args.iters * 1e3:.1f} ms/iter wall  (pending {int(np.asarray(npend))})")
    total = parse_trace(d, args.top)
    print(f"  => device {total / 1e3 / args.iters:.1f} ms/iter")


if __name__ == "__main__":
    main()
