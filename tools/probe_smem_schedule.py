"""Mosaic capability probe for the round-5 schedule-fed traversal design.

PERF_NOTES (round 4) concluded the treelet kernel's per-visit vote
(~1.9 us, scalar-extraction bound) must be ELIMINATED via a visit
schedule computed by an XLA pre-pass and fed to the kernel through SMEM.
That design needs three Mosaic capabilities this probe answers:

  1. an SMEM input with a PER-TILE BlockSpec (each grid step sees its own
     [1, V] schedule block);
  2. reading schedule entries by a DYNAMIC (fori_loop) index from SMEM;
  3. driving an async-copy's HBM source index with that SMEM-read scalar.

The kernel walks its tile's schedule, DMAs each scheduled row of a table
and accumulates it; the result is checked against a numpy replay.

ANSWER (v5e, round 4): ALL THREE WORK, with two constraints —
  * the SMEM operand must be passed whole-array (block == array shape;
    a per-tile (1, V) or (V,) block fails Mosaic's layout verifier with
    "XLA layout T(512) does not match Mosaic layout T(128)"), so the
    kernel indexes it by pl.program_id;
  * wrap the conditional DMA in pl.when (jax.lax.cond around a DMA
    crashes the Mosaic compile subprocess with no message).
Sizing note for the real schedule: whole-array SMEM means the FULL
[n_tiles * V] schedule must fit SMEM; at 256 tiles x 1280 entries x 4 B
= 1.3 MB that likely does not — either shrink V, pack ids to 16 bits,
or split the render call into tile groups.

Run: python tools/probe_smem_schedule.py
"""
import functools
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TILES = 4
V = 128  # schedule entries per tile (SMEM block last dim must be 128-divisible)
NS = 16  # table rows
SENTINEL = np.int32(-1)


def kernel(sched_ref, table_hbm, out_ref, buf, sem, acc_ref):
    acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    def body(i, carry):
        base = pl.program_id(0) * V
        sid = sched_ref[base + i]  # dynamic SMEM read (whole-array operand)

        @pl.when(sid >= 0)
        def _():
            cp = pltpu.make_async_copy(table_hbm.at[sid], buf, sem)
            cp.start()
            cp.wait()
            acc_ref[:] = acc_ref[:] + buf[:]

        return carry

    jax.lax.fori_loop(0, V, body, jnp.int32(0))
    out_ref[:] = acc_ref[:]


def main(interpret: bool):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((NS, 8, 128)), jnp.float32)
    sched = np.full((N_TILES, V), SENTINEL, np.int32)
    for t in range(N_TILES):
        n = rng.integers(1, 12)
        sched[t, :n] = rng.integers(0, NS, n)
    sched_j = jnp.asarray(sched.reshape(-1))  # flat, 128-entry blocks

    out = pl.pallas_call(
        kernel,
        grid=(N_TILES,),
        out_shape=jax.ShapeDtypeStruct((N_TILES * 8, 128), jnp.float32),
        in_specs=[
            # whole-array SMEM operand (Mosaic requires the block to match
            # XLA's layout for flat int arrays); per-tile view = program_id
            pl.BlockSpec((N_TILES * V,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
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
    print(f"interpret={interpret} device={jax.devices()[0]} "
          f"SMEM-schedule probe match={ok}")
    if not ok:
        print("max abs diff", np.abs(got - ref).max())
        sys.exit(1)


if __name__ == "__main__":
    if jax.default_backend() != "tpu":
        # interpret mode trips a JAX-internal lowering-cache KeyError on
        # this whole-array-SMEM + pl.when(DMA) structure; the probe's
        # purpose is the HARDWARE capability answer anyway.
        print("skipping: this probe answers a Mosaic hardware question; "
              "run with the TPU attached")
        sys.exit(0)
    main(interpret=False)
