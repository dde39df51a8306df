"""Does xla_tpu_scoped_vmem_limit_kib (per-executable compiler option) fix
the Pallas fusion-inflation on the REAL wavefront program?

Round-4 measured: MCPT_INTERSECT=woop-fused makes the fused kernels 2.7x
faster per call but inflates the XLA integrator shell 0.29 -> 4.5 ms/iter
(net e2e loss). tools/probe_inflation.py showed per-executable compiler
options DO reach the remote compile service. This probe compiles the real
veach 32k-lane render chunk four ways and reports device ms/iteration:

    xla (default dispatch)            vs  xla + scoped=KIB
    woop-fused                        vs  woop-fused + scoped=KIB

Run:  timeout 900 python tools/probe_scoped_vmem.py [--kib 1024] [--spp 4]
(MCPT_INTERSECT is re-exec'd into the environment for the fused variants.)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, ".")


def measure(scoped_kib, spp, bounces):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mcpt_jax_cache")
    from mcpt_tpu.io.obj import load_scene
    from mcpt_tpu.render.renderer import _render_chunk

    scene = load_scene("scenes/veach-mis.obj", with_bvh=True)
    R = 32768
    pidx = jnp.arange(R, dtype=jnp.int32)
    lane_valid = jnp.ones((R,), bool)
    key = jax.random.PRNGKey(0)
    start = jnp.zeros((), jnp.int32)

    fn = _render_chunk.__wrapped__  # undo the module-level jit
    jfn = jax.jit(fn, static_argnames=("max_bounces", "spp_per_pass"))
    lowered = jfn.lower(scene, pidx, lane_valid, key, start,
                        max_bounces=bounces, spp_per_pass=spp)
    opts = (
        {"xla_tpu_scoped_vmem_limit_kib": str(scoped_kib)}
        if scoped_kib else None
    )
    t0 = time.perf_counter()
    compiled = lowered.compile(opts) if opts else lowered.compile()
    compile_s = time.perf_counter() - t0

    import numpy as np

    dump = os.environ.get("MCPT_DUMP_HLO")
    if dump:
        with open(dump, "w") as f:
            f.write(compiled.as_text())
        print(f"[dump] compiled HLO -> {dump}", flush=True)

    out = compiled(scene, pidx, lane_valid, key, start)
    np.asarray(out[3])  # host readback = true device sync through the relay
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = compiled(scene, pidx, lane_valid, key, start)
        np.asarray(out[3])
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    iters = int(out[3])
    nrays = int(out[1])
    ms_iter = best / iters * 1e3
    mrays = nrays / best / 1e6
    algo = os.environ.get("MCPT_INTERSECT", "woop")
    print(f"algo={algo:10s} scoped={scoped_kib or 'default':>7} : "
          f"{best:6.2f} s/pass  {iters} iters  {ms_iter:6.2f} ms/iter  "
          f"{mrays:6.1f} Mrays/s  (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--kib", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--bounces", type=int, default=24)
    ap.add_argument("--algo", default=None,
                    help="run ONE (algo, scoped) cell: woop|woop-fused")
    ap.add_argument("--scoped", default=None,
                    help="with --algo: '' for default or a KiB value")
    args = ap.parse_args()

    if args.algo is not None:
        os.environ["MCPT_INTERSECT"] = args.algo
        kib = int(args.scoped) if args.scoped else None
        measure(kib, args.spp, args.bounces)
        sys.exit(0)

    # run each cell in a subprocess: MCPT_INTERSECT is read at import, and
    # only ONE TPU process may hold the tunnel at a time, so run serially
    import subprocess

    for algo in ("woop", "woop-fused"):
        for scoped in ("", str(args.kib)):
            cmd = [sys.executable, __file__, "--algo", algo,
                   "--scoped", scoped, "--spp", str(args.spp),
                   "--bounces", str(args.bounces)]
            r = subprocess.run(cmd, capture_output=True, text=True)
            for line in r.stdout.splitlines():
                if line.startswith("algo="):
                    print(line, flush=True)
            if r.returncode != 0:
                print(f"algo={algo} scoped={scoped!r} FAILED:\n"
                      + r.stderr[-500:], flush=True)
