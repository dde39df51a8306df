"""Isolate + attack the Pallas fusion-inflation poison pill (PERF_NOTES r4).

Measured in the real renderer: placing ANY Pallas custom-call inside the
wavefront while-body inflates every neighboring XLA fusion ~12x (shell 0.29
-> 4.5 ms/iter). Hypothesis: the custom-call's scoped-VMEM reservation
evicts XLA's VMEM pinning of the while-loop carries, so every small fusion
round-trips HBM with serialized latency.

This probe reproduces the structure synthetically — a while loop carrying
~3 MB of [R]-lane state whose body runs ~20 small elementwise fusions plus
an optional do-nothing Pallas kernel — and then sweeps candidate fixes:

  * baseline            no kernel                (the 0.29 ms/iter analog)
  * pallas              kernel in the body       (the 4.5 ms/iter analog)
  * scoped=N            pallas + XLA flag xla_tpu_scoped_vmem_limit_kib=N
                        passed via jit compiler options (LIBTPU_INIT_ARGS
                        did not observably reach the remote compile service
                        in round 4; per-executable options might)
  * vmem_cap            pallas + pltpu.CompilerParams(vmem_limit_bytes=1MB)
  * small-carry         pallas + half the carried state

Run: timeout 600 python tools/probe_inflation.py
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 32768
ITERS = 200
N_COLS = 20  # carried [R] state columns ~ the wavefront's ~23


def _kernel(x_ref, o_ref, scratch):
    # mimic the fused Woop kernel's footprint: a [Rt, 128] tile in VMEM,
    # modest scratch, real (cheap) vector work
    scratch[:] = x_ref[:] * 2.0
    o_ref[:] = scratch[:] + 1.0


def _pallas_call(x, vmem_cap=None):
    Rt = 512
    params = (
        pltpu.CompilerParams(vmem_limit_bytes=vmem_cap) if vmem_cap else None
    )
    return pl.pallas_call(
        _kernel,
        grid=(R // Rt,),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        in_specs=[pl.BlockSpec((Rt, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Rt, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Rt, 128), jnp.float32)],
        compiler_params=params,
    )(x)


def make_fn(with_pallas: bool, n_cols: int = N_COLS, vmem_cap=None):
    def body(st):
        cols, k, x128 = st["cols"], st["i"], st["x128"]
        if with_pallas:
            y = _pallas_call(x128, vmem_cap=vmem_cap)
            feed = y[:, 0]
        else:
            feed = x128[:, 0] * 2.0 + 1.0
        # ~20 small dependent fusions over the carried columns (the
        # integrator-shell analog: NEE/BSDF/RNG arithmetic on [R] lanes)
        new_cols = []
        acc = feed
        for j, c in enumerate(cols):
            c2 = c * 1.0001 + acc * (0.1 + 0.01 * j)
            c2 = jnp.where(c2 > 10.0, c2 - 10.0, c2)
            acc = jnp.sqrt(jnp.abs(c2) + 0.5)
            new_cols.append(c2)
        x128n = x128 * 0.999 + acc[:, None] * 1e-3
        return {"cols": tuple(new_cols), "i": k + 1, "x128": x128n}

    def fn(cols, x128):
        st = {"cols": cols, "i": jnp.zeros((), jnp.int32), "x128": x128}
        st = jax.lax.while_loop(lambda s: s["i"] < ITERS, body, st)
        return st["cols"][0], st["x128"]

    return fn, n_cols


def run(tag, with_pallas, n_cols=N_COLS, vmem_cap=None, compiler_options=None):
    fn, n_cols = make_fn(with_pallas, n_cols, vmem_cap)
    rng = np.random.default_rng(0)
    cols = tuple(jnp.asarray(rng.standard_normal(R), jnp.float32)
                 for _ in range(n_cols))
    x128 = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)
    jfn = jax.jit(fn)
    if compiler_options:
        compiled = jfn.lower(cols, x128).compile(compiler_options)
        call = compiled
    else:
        call = jfn
    t0 = time.perf_counter()
    out = call(cols, x128)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = call(cols, x128)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    per_iter_us = min(times) / ITERS * 1e6
    print(f"{tag:28s} {per_iter_us:9.1f} us/iter   (compile {compile_s:.1f}s)",
          flush=True)
    return per_iter_us


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}  R={R} cols={N_COLS} iters={ITERS}")
    base = run("baseline (no pallas)", False)
    pal = run("pallas in body", True)
    print(f"  -> inflation x{pal / max(base, 1e-9):.1f}")
    for kib in (128, 1024, 4096, 16384, 65536):
        try:
            run(f"pallas + scoped={kib}KiB", True,
                compiler_options={"xla_tpu_scoped_vmem_limit_kib": str(kib)})
        except Exception as e:
            print(f"pallas + scoped={kib}KiB  FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}")
    try:
        run("baseline + scoped=1024KiB", False,
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "1024"})
    except Exception as e:
        print(f"baseline scoped FAILED: {str(e)[:120]}")
    run("pallas + vmem_cap=1MB", True, vmem_cap=1 << 20)
    run("pallas + half carry", True, n_cols=N_COLS // 2)
