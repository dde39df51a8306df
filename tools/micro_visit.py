"""Decompose the treelet kernel's per-VISIT cost inside Pallas.

The traversal kernel's inner iteration = vote (tile-min + scalar
extracts) + DMA wait + one [Rt, 2C] Moller-Trumbore wave + best update.
In-program it measures ~4.6 us/visit at spp=8 on bathroom while the wave
alone should cost ~1.9 us at 1 vreg-op/cycle — this tool isolates the
three components with dedicated micro-kernels so the next optimization
attacks the right one:

  wave-only : N iterations of the exact wave+accept+update body over a
              static VMEM buffer (no votes, no DMA)
  vote-only : N iterations of the pair vote (two masked tile-mins, two
              scalar extracts, masked rewrite) over a static key matrix
  dma-only  : N sequential [16, 2C] HBM->VMEM copies, each waited
              (the real kernel double-buffers, so this is the un-hidden
              latency bound, not the steady-state cost)

Run: python tools/micro_visit.py
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcpt_tpu.ops.pallas.traverse import _mt_wave

RT = 128
C2 = 256  # pair width
N_IT = 2048
KEY_MISS = np.int32(2**31 - 1)
F32_MAX = np.float32(np.finfo(np.float32).max)
ID_MISS = np.int32(2**30)


def _wave_kernel(tri_ref, ray_ref, out_ref, tribuf, *, n_it):
    tribuf[:] = tri_ref[:]
    rays = ray_ref[:]
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    t_lo = rays[:, 9][:, None]
    t_hi = rays[:, 10][:, None]

    def body(i, st):
        best_t, best_id = st
        t, u, v, ok, tri_id = _mt_wave(tribuf, o, d, t_lo, 1e-5)
        accept = (
            ok & (t >= t_lo) & (t < t_hi) & (t <= best_t)
            & (u >= 0) & (v >= 0) & (1.0 - u - v >= 0)
        )
        t_cand = jnp.where(accept, t, F32_MAX)
        row_t = jnp.min(t_cand, axis=1)[:, None]
        row_id = jnp.min(
            jnp.where(t_cand <= row_t, tri_id, ID_MISS), axis=1
        )[:, None]
        better = (row_t < best_t) & (row_t < F32_MAX)
        return (
            jnp.where(better, row_t, best_t),
            jnp.where(better, row_id, best_id),
        )

    best_t, best_id = jax.lax.fori_loop(
        0, n_it, body, (t_hi, jnp.full((RT, 1), ID_MISS, jnp.int32))
    )
    out_ref[:] = jnp.broadcast_to(best_t, out_ref.shape)


def _vote_kernel(key_ref, out_ref, rest_ref, *, n_it, bits):
    keys = key_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)

    def body(i, acc):
        # the pair vote exactly as the traversal kernel runs it (two
        # masked tile-mins with scalar extracts + the masked rewrite),
        # keyed off the persistent matrix so every iteration costs the same
        k = keys | (i & 0)  # data dependence on i without changing values
        m1 = jnp.min(jnp.where(k != KEY_MISS, k, KEY_MISS))
        b1 = m1 & ((1 << bits) - 1)
        k1 = jnp.where(lane == b1, KEY_MISS, k)
        m2 = jnp.min(jnp.where(k1 != KEY_MISS, k1, KEY_MISS))
        b2 = jnp.where(m2 != KEY_MISS, m2 & ((1 << bits) - 1), b1)
        rest_ref[:] = jnp.where(lane == b2, KEY_MISS, k1)
        return acc + b1 + b2

    acc = jax.lax.fori_loop(0, n_it, body, jnp.int32(0))
    out_ref[:] = jnp.broadcast_to(acc, out_ref.shape)


def _dma_kernel(tri_hbm, out_ref, tribuf, sem, *, n_it, n_slots):
    def body(i, acc):
        s = jax.lax.rem(i, n_slots)
        cp = pltpu.make_async_copy(tri_hbm.at[s], tribuf, sem)
        cp.start()
        cp.wait()
        return acc + 1

    acc = jax.lax.fori_loop(0, n_it, body, jnp.int32(0))
    out_ref[:] = jnp.broadcast_to(acc.astype(jnp.float32), out_ref.shape)


def timeit(f, *a, n=10):
    np.asarray(jax.tree_util.tree_leaves(f(*a))[-1])
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = f(*a)
    np.asarray(jax.tree_util.tree_leaves(out)[-1])
    return (time.perf_counter() - t0) / n


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    tri = jnp.asarray(rng.standard_normal((16, C2)), jnp.float32)
    rays = jnp.zeros((RT, 16), jnp.float32)
    rays = rays.at[:, 3:6].set(
        jnp.asarray(rng.standard_normal((RT, 3)), jnp.float32)
    )
    rays = rays.at[:, 9].set(1e-4).at[:, 10].set(F32_MAX)

    wave = jax.jit(functools.partial(
        pl.pallas_call,
        out_shape=jax.ShapeDtypeStruct((RT, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, C2), jnp.float32)],
    )(functools.partial(_wave_kernel, n_it=N_IT)))
    dt = timeit(wave, tri, rays)
    print(f"wave+update only : {dt / N_IT * 1e6:7.3f} us/visit "
          f"({RT * C2 / (dt / N_IT) / 1e9:.1f} Gtest/s)")

    keys = jnp.asarray(
        rng.integers(0, 2**20, (RT, 128)) << 7 | np.arange(128), jnp.int32
    )
    vote = jax.jit(functools.partial(
        pl.pallas_call,
        out_shape=jax.ShapeDtypeStruct((RT, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((RT, 128), jnp.int32)],
    )(functools.partial(_vote_kernel, n_it=N_IT, bits=7)))
    dt = timeit(vote, keys)
    print(f"pair vote only   : {dt / N_IT * 1e6:7.3f} us/visit")

    n_slots = 64
    tri_hbm = jnp.asarray(
        rng.standard_normal((n_slots, 16, C2)), jnp.float32
    )
    dma = jax.jit(functools.partial(
        pl.pallas_call,
        out_shape=jax.ShapeDtypeStruct((RT, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        scratch_shapes=[
            pltpu.VMEM((16, C2), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(functools.partial(_dma_kernel, n_it=N_IT, n_slots=n_slots)))
    dt = timeit(dma, tri_hbm)
    print(f"serial DMA+wait  : {dt / N_IT * 1e6:7.3f} us/visit "
          "(un-hidden latency; the kernel double-buffers)")


if __name__ == "__main__":
    main()
