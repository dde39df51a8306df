"""TPU microbenchmarks that decide the large-scene traversal design.

Run on the real chip:  python tools/micro_tpu.py

Measures the primitives the block-wave traversal composes from:
  * row gathers (shading gathers): [R] rows from [N, M] tables
  * block gathers (vmap dynamic_slice): G contiguous blocks from [L*C, M]
  * dense [R, L] AABB slab test + argmin (the cull)
  * iterative top-K over [R, L] (candidate list build)
  * sort/argsort of [R] keys (ray reordering)
  * Woop MXU intersect wave [R, C] at HIGHEST precision
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
    )
    for _ in range(warmup - 1):
        out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn_j(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)

    # ---- 1. row gathers ----
    print("\n# row gather: take(table[N,M], idx[R])")
    for N in (1024, 16384, 65536, 1048576):
        for M in (4, 36, 128):
            for R in (4096, 32768):
                table = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)
                idx = jnp.asarray(rng.integers(0, N, R), jnp.int32)
                dt = timeit(lambda t, i: jnp.take(t, i, axis=0), table, idx)
                print(f"  N={N:8d} M={M:4d} R={R:6d}  {dt*1e6:9.1f} us  "
                      f"{R*M*4/dt/1e9:7.2f} GB/s-useful")

    # ---- 2. block gather: vmap(dynamic_slice) of contiguous blocks ----
    print("\n# block gather: G blocks of [C,M] from [T0,M] (contiguous rows)")
    for (G, C, M) in ((32, 512, 12), (64, 256, 12), (32, 512, 48)):
        T0 = 1048576
        table = jnp.asarray(rng.standard_normal((T0, M)), jnp.float32)
        starts = jnp.asarray(rng.integers(0, T0 // C, G) * C, jnp.int32)

        def f(t, s):
            return jax.vmap(
                lambda st: jax.lax.dynamic_slice(t, (st, 0), (C, M))
            )(s)

        dt = timeit(f, table, starts)
        print(f"  G={G} C={C} M={M}  {dt*1e6:9.1f} us  "
              f"{G*C*M*4/dt/1e9:7.2f} GB/s-useful")

    # ---- 3. dense slab test + argmin over L ----
    print("\n# [R,L] slab cull + argmin")
    for (R, L) in ((8192, 512), (8192, 2048), (8192, 4096), (32768, 2048)):
        lo = jnp.asarray(rng.standard_normal((L, 3)), jnp.float32)
        hi = lo + 1.0
        org = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)
        inv = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)

        def slab(lo, hi, org, inv):
            ta = (lo[None] - org[:, None]) * inv[:, None]  # [R,L,3]
            tb = (hi[None] - org[:, None]) * inv[:, None]
            near = jnp.max(jnp.minimum(ta, tb), axis=-1)
            far = jnp.min(jnp.maximum(ta, tb), axis=-1) * 1.001
            ok = jnp.maximum(near, 1e-4) < far
            entry = jnp.where(ok, jnp.maximum(near, 0.0), jnp.inf)
            return jnp.argmin(entry, axis=1), entry.min(axis=1)

        dt = timeit(slab, lo, hi, org, inv)
        print(f"  R={R} L={L}  {dt*1e6:9.1f} us  {dt/R*1e9:7.1f} ns/ray")

    # ---- 4. iterative top-K via K x argmin ----
    print("\n# top-K over [R,L] entry_t (iterative argmin) and lax.top_k")
    R, L = 8192, 2048
    entry = jnp.asarray(rng.standard_normal((R, L)), jnp.float32)

    def topk_iter(e, K=16):
        ids, ts = [], []
        for _ in range(K):
            i = jnp.argmin(e, axis=1)
            t = jnp.min(e, axis=1)
            ids.append(i); ts.append(t)
            e = e + (jax.nn.one_hot(i, L, dtype=e.dtype) * jnp.inf)
        return jnp.stack(ids, 1), jnp.stack(ts, 1)

    for K in (8, 16, 32):
        dt = timeit(lambda e: topk_iter(e, K), entry)
        print(f"  iter-argmin K={K}: {dt*1e6:9.1f} us")
    for K in (16, 32):
        dt = timeit(lambda e: jax.lax.top_k(-e, K), entry)
        print(f"  lax.top_k  K={K}: {dt*1e6:9.1f} us")

    # ---- 5. sort ----
    print("\n# argsort int32 keys")
    for R in (8192, 32768, 262144):
        keys = jnp.asarray(rng.integers(0, 2048, R), jnp.int32)
        dt = timeit(lambda k: jnp.argsort(k), keys)
        print(f"  R={R}: {dt*1e6:9.1f} us")

    # ---- 6. Woop wave [R,C] matmul epilogue at HIGHEST ----
    print("\n# woop wave: [R,8] @ [8,6C] + epilogue")
    for (R, C) in ((8192, 256), (8192, 512), (32768, 512)):
        A = jnp.asarray(rng.standard_normal((R, 8)), jnp.float32)
        B = jnp.asarray(rng.standard_normal((8, 6 * C)), jnp.float32)

        def woop(A, B):
            P = jnp.dot(A, B, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST).reshape(R, C, 6)
            dz = P[..., 5]
            ok = jnp.abs(dz) >= 1e-9
            inv_dz = jnp.where(ok, 1.0 / jnp.where(ok, dz, 1.0), 0.0)
            t = -P[..., 2] * inv_dz
            u = P[..., 0] + t * P[..., 3]
            v = P[..., 1] + t * P[..., 4]
            acc = ok & (t >= 1e-4) & (u >= 0) & (v >= 0) & (1 - u - v >= 0)
            tc = jnp.where(acc, t, jnp.inf)
            return jnp.min(tc, axis=1), jnp.argmin(tc, axis=1)

        dt = timeit(woop, A, B)
        print(f"  R={R} C={C}: {dt*1e6:9.1f} us  "
              f"{R*C/dt/1e9:6.2f} Gpairs/s  {dt/R*1e9:6.1f} ns/ray")

    # ---- 7. gather rays then woop (segment processing shape) ----
    print("\n# per-group dynamic-slice tri block + woop for G groups of Rg rays")
    G, Rg, C = 32, 256, 512
    T0 = 1048576
    blk = jnp.asarray(rng.standard_normal((T0, 8, 6)), jnp.float32)  # 6C cols per C rows
    A = jnp.asarray(rng.standard_normal((G, Rg, 8)), jnp.float32)
    starts = jnp.asarray(rng.integers(0, T0 // C, G) * C, jnp.int32)

    def seg(A, blk, starts):
        def one(a, st):
            b = jax.lax.dynamic_slice(blk, (st, 0, 0), (C, 8, 6))
            B = b.transpose(1, 0, 2).reshape(8, C * 6)
            P = jnp.dot(a, B, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST).reshape(Rg, C, 6)
            t = -P[..., 2] * jnp.where(jnp.abs(P[..., 5]) > 1e-9, 1.0 / P[..., 5], 0.0)
            return jnp.min(jnp.where(t > 0, t, jnp.inf), axis=1)

        return jax.vmap(one)(A, starts)

    dt = timeit(seg, A, blk, starts)
    print(f"  G={G} Rg={Rg} C={C}: {dt*1e6:9.1f} us  "
          f"{G*Rg/dt/1e6:6.2f} Mrays/s-this-op")


if __name__ == "__main__":
    main()
