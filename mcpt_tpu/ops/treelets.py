"""Two-level treelet layout: the data structure behind the Pallas traversal.

The reference traverses a pointer BVH per ray (src/BVH.cpp:90-136). A TPU has
one vector core and no per-lane control flow, so the kernel
(ops/pallas/traverse.py) instead walks a *two-level* cut of the same BVH,
voting per ray-tile and intersecting whole treelets as dense [tile, C] waves:

  * treelet   = a BVH subtree with <= C triangles, its EXACT subtree AABB,
    and its triangles contiguous in the BVH-reordered buffer (leaf ranges are
    preorder-contiguous, see ops/bvh.py). Padded to C lanes with degenerate
    triangles (det == 0 can never pass the Moller-Trumbore eps test).
  * superblock = a higher BVH subtree containing <= S_B whole treelets, also
    with its exact AABB. Treelet slots are padded to S_B with inverted boxes
    (slab test can never pass).

Because both cuts are subtree-aligned, every AABB is a true BVH node box —
culling quality is that of the underlying SAH/midpoint build.

Device arrays (HBM unless noted):
  sb_box  f32[8, NSp]           rows lo.xyz hi.xyz valid pad; VMEM-resident
  blk_box f32[NS, 8, S_B]       per-superblock treelet boxes (same row
                                layout); DMA'd per chosen superblock
  tri     f32[NS * S_B, 16, C]  rows v0.xyz e1.xyz e2.xyz id(bitcast i32)
                                + 6 zero pad rows (16 sublanes = whole f32
                                VMEM tiles); one row == one DMA of a
                                treelet's triangles
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_C = 128  # triangles per treelet (one VPU lane-width)
DEFAULT_SB = 128  # treelet slots per superblock

_INV_LO = np.float32(np.finfo(np.float32).max)
_INV_HI = np.float32(-np.finfo(np.float32).max)
PAD_TRI_ID = np.int32(2**30)


@dataclass(frozen=True)
class TreeletSet:
    """Device arrays of the two-level layout (see module docstring)."""

    sb_box: jnp.ndarray  # f32[8, NSp]
    blk_box: jnp.ndarray  # f32[NS, 8, S_B]
    tri: jnp.ndarray  # f32[NS * S_B, 16, C]
    n_real_tris: int

    @property
    def ns(self) -> int:
        return self.blk_box.shape[0]

    @property
    def s_b(self) -> int:
        return self.blk_box.shape[2]

    @property
    def c(self) -> int:
        return self.tri.shape[2]


jax.tree_util.register_dataclass(
    TreeletSet,
    data_fields=["sb_box", "blk_box", "tri"],
    meta_fields=["n_real_tris"],
)


def _subtree_ranges(nodes):
    """Per-node (tri_start, tri_count) from the preorder flat BVH.

    Leaf ranges are assigned in preorder (ops/bvh.py), so the triangles of
    node i's subtree are exactly [sum of leaf counts before i in preorder,
    ... + subtree count).
    """
    count = np.asarray(nodes["count"], np.int64)
    skip = np.asarray(nodes["skip"], np.int64)
    n = count.shape[0]
    end = np.where(skip < 0, n, skip)
    cum = np.concatenate([[0], np.cumsum(count)])  # cum[i] = tris in leaves < i
    tri_start = cum[:-1]
    tri_count = cum[end] - cum[:-1]
    return tri_start, tri_count, end


def _cut(nodes, tri_start, tri_count, end, keep):
    """Preorder frontier of highest nodes satisfying `keep(i)` (leaves always
    kept). Returns node indices in preorder."""
    count = nodes["count"]
    out = []
    stack = [0]
    while stack:
        i = stack.pop()
        if count[i] > 0 or keep(i):
            out.append(i)
            continue
        left = i + 1
        right = int(end[left])
        stack.append(right)  # pushed first -> popped after left (preorder)
        stack.append(left)
    return np.asarray(out, np.int64)


def build_treelets(
    v0,
    e1,
    e2,
    nodes: dict,
    c: int = DEFAULT_C,
    s_b: int = DEFAULT_SB,
    to_device: bool = True,
):
    """Build the TreeletSet from BVH-reordered triangles + flat BVH nodes.

    v0/e1/e2 must already be in BVH order (post permute_scene_tris).
    Pure numpy; one batched device transfer at the end.
    """
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    T = v0.shape[0]
    lo = np.asarray(nodes["lo"], np.float32)
    hi = np.asarray(nodes["hi"], np.float32)

    tri_start, tri_count, end = _subtree_ranges(nodes)
    assert tri_count[0] == T, "root subtree must cover all triangles"
    # the preorder-contiguity invariant both builders guarantee: a leaf's
    # range starts exactly where the preorder prefix of leaf counts ends
    leaf = np.asarray(nodes["count"]) > 0
    assert (tri_start[leaf] == np.asarray(nodes["first"])[leaf]).all()

    # level-1 cut: treelets of <= c triangles
    tl = _cut(nodes, tri_start, tri_count, end, lambda i: tri_count[i] <= c)
    tl_start = tri_start[tl]
    tl_count = tri_count[tl]
    assert tl_count.max(initial=0) <= c
    n_tl = len(tl)

    # level-2 cut: superblocks of <= s_b whole treelets
    def n_treelets_inside(i):
        a = np.searchsorted(tl_start, tri_start[i], side="left")
        b = np.searchsorted(tl_start, tri_start[i] + tri_count[i], side="left")
        return b - a

    sb = _cut(nodes, tri_start, tri_count, end, lambda i: n_treelets_inside(i) <= s_b)
    ns = len(sb)

    # ---- assemble device arrays ----
    nsp = max(128, -(-ns // 128) * 128)
    sb_box = np.zeros((8, nsp), np.float32)
    sb_box[0:3, :] = _INV_LO
    sb_box[3:6, :] = _INV_HI
    sb_box[0:3, :ns] = lo[sb].T
    sb_box[3:6, :ns] = hi[sb].T
    sb_box[6, :ns] = 1.0  # valid flag (row 6; kernels mask pad columns)

    blk_box = np.zeros((ns, 8, s_b), np.float32)
    blk_box[:, 0:3, :] = _INV_LO
    blk_box[:, 3:6, :] = _INV_HI

    tri = np.zeros((ns * s_b, 16, c), np.float32)
    # pad lanes: zero triangles (det == 0) with a huge id
    tri[:, 9, :] = np.float32(np.int32(PAD_TRI_ID).view(np.float32))

    ids = np.arange(T, dtype=np.int32)
    cursor = 0  # next unassigned treelet (treelets are preorder == tri order)
    for s_i, node in enumerate(sb):
        s0 = tri_start[node]
        s1 = s0 + tri_count[node]
        a = cursor
        while cursor < n_tl and tl_start[cursor] < s1:
            cursor += 1
        members = range(a, cursor)
        assert len(members) <= s_b
        for k, j in enumerate(members):
            t0, cnt = int(tl_start[j]), int(tl_count[j])
            node_j = tl[j]
            blk_box[s_i, 0:3, k] = lo[node_j]
            blk_box[s_i, 3:6, k] = hi[node_j]
            blk_box[s_i, 6, k] = 1.0  # valid flag
            g = s_i * s_b + k
            tri[g, 0:3, :cnt] = v0[t0 : t0 + cnt].T
            tri[g, 3:6, :cnt] = e1[t0 : t0 + cnt].T
            tri[g, 6:9, :cnt] = e2[t0 : t0 + cnt].T
            tri[g, 9, :cnt] = ids[t0 : t0 + cnt].view(np.float32)
        assert s0 == tl_start[a], "superblock must start on a treelet boundary"
    assert cursor == n_tl, "all treelets must be assigned to superblocks"

    ts = TreeletSet(
        sb_box=sb_box, blk_box=blk_box, tri=tri, n_real_tris=T
    )
    if to_device:
        ts = TreeletSet(
            sb_box=jnp.asarray(sb_box),
            blk_box=jnp.asarray(blk_box),
            tri=jnp.asarray(tri),
            n_real_tris=T,
        )
    return ts
