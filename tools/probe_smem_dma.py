"""Probe: per-tile schedule delivery via HBM->SMEM scratch DMA.

The round-4 probe (probe_smem_schedule.py) showed SMEM *operands* must be
whole-array (bounding total schedule size by SMEM). This probe asks the
follow-up that removes the bound: can a kernel

  1. async-copy its OWN tile's [V] i32 schedule row from an HBM (ANY)
     operand into an SMEM scratch ref (dynamic source row = program_id);
  2. read scalars from that SMEM scratch by a fori_loop index;
  3. drive a second, VMEM-bound DMA's HBM source index with them?

If yes, the real schedule lives in HBM [n_tiles, V] and SMEM only ever
holds one tile's row (V*4 bytes) — no whole-array constraint, single
pallas_call, any n_tiles.

Also probes a LARGE V (4096) to find practical SMEM scratch limits.

Run: timeout 300 python tools/probe_smem_dma.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TILES = 4
NS = 16
SENTINEL = np.int32(-1)


def make_kernel(V):
    # schedule rows are [4, V//4]: slicing the OUTER (untiled) dim of a 3-D
    # HBM array is always aligned; a 2-D [n_tiles, V] row slice trips
    # Mosaic's "slice must be aligned to tiling (4)" rule for V > 128
    Vq = V // 4

    def kernel(sched_hbm, table_hbm, out_ref, sbuf, buf, sem_s, sem, acc_ref):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(sched_hbm.at[i], sbuf, sem_s)
        cp.start()
        cp.wait()
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

        def body(v, carry):
            sid = sbuf[v // Vq, v % Vq]

            @pl.when(sid >= 0)
            def _():
                c2 = pltpu.make_async_copy(table_hbm.at[sid], buf, sem)
                c2.start()
                c2.wait()
                acc_ref[:] = acc_ref[:] + buf[:]

            return carry

        jax.lax.fori_loop(0, V, body, jnp.int32(0))
        out_ref[:] = acc_ref[:]

    return kernel


def run(V, interpret=False):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((NS, 8, 128)), jnp.float32)
    sched = np.full((N_TILES, V), SENTINEL, np.int32)
    for t in range(N_TILES):
        n = int(rng.integers(1, min(V, 12)))
        sched[t, :n] = rng.integers(0, NS, n)
    sched_j = jnp.asarray(sched.reshape(N_TILES, 4, V // 4))

    out = pl.pallas_call(
        make_kernel(V),
        grid=(N_TILES,),
        out_shape=jax.ShapeDtypeStruct((N_TILES * 8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((4, V // 4), jnp.int32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(sched_j, table)
    got = np.asarray(jax.block_until_ready(out))

    ref = np.zeros_like(got)
    tb = np.asarray(table)
    for t in range(N_TILES):
        acc = np.zeros((8, 128), np.float32)
        for sid in sched[t]:
            if sid >= 0:
                acc += tb[sid]
        ref[t * 8:(t + 1) * 8] = acc
    ok = np.allclose(got, ref, rtol=1e-6, atol=1e-6)
    print(f"V={V}: SMEM-scratch schedule DMA match={ok}")
    if not ok:
        print("max abs diff", np.abs(got - ref).max())
        sys.exit(1)


if __name__ == "__main__":
    if jax.default_backend() != "tpu":
        print("run with the TPU attached (hardware Mosaic question)")
        sys.exit(0)
    print(f"device: {jax.devices()[0]}")
    run(512)
    run(1024)
    run(4096)
    run(16384)
