"""Device mesh construction for sharded rendering.

The renderer's parallel decomposition (SURVEY §2.3):
  * 'tiles' axis — data parallelism over image row blocks (each device owns a
    contiguous block of film rows; no cross-device traffic in the forward
    pass, gather only at display/save time);
  * 'spp'   axis — sample parallelism (devices render disjoint sample
    indices of the same pixels; film accumulators are psum-reduced over ICI).

Scene arrays are replicated on every chip (they fit in HBM; only rays move).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_tiles: Optional[int] = None, n_spp: int = 1, devices=None) -> Mesh:
    """Build a ('tiles', 'spp') mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_tiles is None:
        n_tiles = n // n_spp
    assert n_tiles * n_spp == n, f"{n_tiles}x{n_spp} != {n} devices"
    arr = mesh_utils.create_device_mesh((n_tiles, n_spp), devices=np.array(devices))
    return Mesh(arr, ("tiles", "spp"))


def film_sharding(mesh: Mesh) -> NamedSharding:
    """Film accum [H, W, 3]: rows sharded over 'tiles', replicated over 'spp'."""
    return NamedSharding(mesh, P("tiles", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
