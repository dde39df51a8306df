"""Probe which kernel feature wedges the worker: grid x DMA x while x fetch.

Usage: python tools/probe_grid.py <variant>
  v0: gridless kernel, DMA in fori_loop, fetch
  v1: grid=4, DMA in fori_loop, fetch
  v2: grid=4, DMA in nested while_loop, fetch
  v3: the real closest kernel, grid=1 (R=Rt), fetch
  v4: the real closest kernel, grid=4, fetch
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

jax.config.update("jax_compilation_cache_dir", "/tmp/mcpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def simple_kernel(x_ref, table_hbm, out_ref, tribuf, sem, *, use_while):
    # sum a few DMA'd rows into out
    def body(i, acc):
        dma = pltpu.make_async_copy(table_hbm.at[i], tribuf, sem)
        dma.start()
        dma.wait()
        return acc + tribuf[:]

    if use_while:
        def cond(st):
            i, acc = st
            return i < 4

        def wbody(st):
            i, acc = st

            def cond2(st2):
                j, acc2 = st2
                return j < 2

            def body2(st2):
                j, acc2 = st2
                return j + 1, body(i * 2 + j, acc2)

            _, acc = jax.lax.while_loop(cond2, body2, (jnp.int32(0), acc))
            return i + 1, acc

        _, acc = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), jnp.zeros_like(tribuf[:]))
        )
    else:
        acc = jax.lax.fori_loop(0, 8, body, jnp.zeros_like(tribuf[:]))
    out_ref[:] = acc + x_ref[:]


def run_simple(grid_n, use_while):
    RT = 256
    R = RT * grid_n
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)
    table = jnp.asarray(rng.standard_normal((64, RT, 128)), jnp.float32)
    out = pl.pallas_call(
        functools.partial(simple_kernel, use_while=use_while),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec((RT, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (RT, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((RT, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(x, table)
    v = np.asarray(out)
    ref = np.asarray(table)[:8].sum(axis=0) + np.asarray(x).reshape(
        grid_n, RT, 128
    )
    ok = np.allclose(v.reshape(grid_n, RT, 128), ref, rtol=1e-5, atol=1e-5)
    print(f"simple grid={grid_n} while={use_while}: fetched, match={ok}",
          flush=True)


def run_real(R, ray_tile):
    from mcpt_tpu.ops.bvh import build_bvh_arrays
    from mcpt_tpu.ops.pallas.traverse import closest_hit_treelets
    from mcpt_tpu.ops.treelets import build_treelets

    class F:
        def __init__(s, t):
            s.treelets = t

    T = 20000
    rng = np.random.default_rng(0)
    base = rng.uniform(-5, 5, (T, 3))
    e1 = rng.normal(size=(T, 3)) * 0.3
    e2 = rng.normal(size=(T, 3)) * 0.3
    nodes, perm = build_bvh_arrays(base, e1, e2)
    ts = build_treelets(base[perm], e1[perm], e2[perm], nodes)
    fake = F(ts)
    o = jnp.asarray(rng.uniform(-6, 6, (R, 3)), jnp.float32)
    d = rng.normal(size=(R, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    h = closest_hit_treelets(fake, o, d, ray_tile=ray_tile)
    v = np.asarray(h.tri)
    print(f"real R={R} tile={ray_tile}: fetched, hits={(v>=0).sum()}",
          flush=True)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "v0"
    print("device:", jax.devices()[0], "variant:", variant, flush=True)
    if variant == "v0":
        run_simple(1, False)
    elif variant == "v1":
        run_simple(4, False)
    elif variant == "v2":
        run_simple(4, True)
    elif variant == "v3":
        run_real(1024, 1024)
    elif variant == "v4":
        run_real(4096, 1024)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
