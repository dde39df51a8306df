"""Row gathers tuned for TPU.

Dynamic gathers serialize on the TPU scalar core; for small tables a one-hot
matmul runs on the MXU instead (exactness: 0/1 lhs with HIGHEST precision
reproduces f32 rows to within one ulp-scale rounding of the 6-pass bf16
decomposition). Large tables fall back to the native gather.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Tables up to this many rows use the one-hot matmul path. Above it, the
# [R, T] one-hot traffic outweighs the gather cost.
ONEHOT_MAX_ROWS = 256


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray, onehot_max: int = None):
    """table [T,F], idx i32[R] -> [R,F]."""
    if onehot_max is None:  # read the global at CALL time (patchable)
        onehot_max = ONEHOT_MAX_ROWS
    T = table.shape[0]
    if T <= onehot_max:
        oh = (idx[:, None] == jnp.arange(T, dtype=idx.dtype)[None, :]).astype(
            table.dtype
        )
        return jax.lax.dot_general(
            oh,
            table,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=table.dtype,
        )
    return jnp.take(table, idx, axis=0)
