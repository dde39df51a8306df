"""Probe: the three Pallas/Mosaic capabilities the traversal megakernel needs.

  1. vector min-reduction -> scalar -> used as a data-dependent DMA offset
     into an HBM-resident ref (pltpu.make_async_copy with .at[g])
  2. jax.lax.while_loop with vector carries inside a kernel
  3. dynamic leading-dim indexing of a VMEM-resident ref

Run: JAX_PLATFORMS=cpu python tools/probe_pallas.py   (interpret check)
     python tools/probe_pallas.py                      (real TPU)
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(keys_ref, table_hbm, blkbox_ref, out_ref, tri_scratch, sem, *, NS):
    # --- 2. while_loop with vector carry: consume the 4 smallest keys ---
    def cond(st):
        best, acc, it = st
        return (it < 4) & jnp.any(keys_ref[:] < best)

    def body(st):
        best, acc, it = st
        # --- 1. vector min -> scalar ---
        masked = jnp.where(keys_ref[:] < best, keys_ref[:], jnp.int32(2**31 - 1))
        m = jnp.min(masked)  # scalar from vector reduce
        sid = m & (NS - 1)

        # --- 3. dynamic leading-dim index of VMEM ref ---
        row = blkbox_ref[sid]  # [128] f32

        # --- 1b. scalar as DMA offset into HBM ref ---
        dma = pltpu.make_async_copy(table_hbm.at[sid], tri_scratch, sem)
        dma.start()
        dma.wait()
        acc = acc + tri_scratch[:] + row[None, :]
        # mask that column: keys whose low bits == sid -> MISS
        k = keys_ref[:]
        keys_ref[:] = jnp.where((k & (NS - 1)) == sid, jnp.int32(2**31 - 1), k)
        return best, acc, it + 1

    best = jnp.int32(2**31 - 1)
    acc = jnp.zeros_like(tri_scratch[:])
    _, acc, n = jax.lax.while_loop(cond, body, (best, acc, jnp.int32(0)))
    out_ref[:] = acc + n.astype(jnp.float32)


def main(interpret):
    NS = 64
    RT = 8
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 2**20, (RT, 128)), jnp.int32)
    table = jnp.asarray(rng.standard_normal((NS, 8, 128)), jnp.float32)
    blkbox = jnp.asarray(rng.standard_normal((NS, 128)), jnp.float32)

    out = pl.pallas_call(
        functools.partial(kernel, NS=NS),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(keys, table, blkbox)
    out = np.asarray(jax.block_until_ready(out))

    # reference: replay the same consumption order in numpy
    k = np.asarray(keys).copy()
    acc = np.zeros((8, 128), np.float32)
    n = 0
    for _ in range(4):
        if not (k < 2**31 - 1).any():
            break
        m = k.min()
        sid = int(m) & (NS - 1)
        acc += np.asarray(table)[sid] + np.asarray(blkbox)[sid][None, :]
        k[(k & (NS - 1)) == sid] = 2**31 - 1
        n += 1
    ref = acc + n
    ok = np.allclose(out, ref, rtol=1e-6, atol=1e-6)
    print(f"interpret={interpret} device={jax.devices()[0]} match={ok}")
    if not ok:
        print("max abs diff", np.abs(out - ref).max())
        sys.exit(1)


if __name__ == "__main__":
    main(interpret=jax.default_backend() != "tpu")
