"""8-wide BVH for the TPU wavefront (reference ``wbvh_node_t``,
internal/Core.h:118, built by FlattenBVH_r, Core.cpp:722).

Why wide on TPU: traversal steps are dominated by *row-gather latency* —
a (R, k) gather costs the same for k = 3 or k = 56 (measured; the row
rides one vector register), so fetching 8 children per step instead of 2
cuts the step count ~3× for near-free.  Leaves inline their ≤ max_leaf
triangles (positions + prim ids) into one padded "leaf group" row, so a
leaf visit is also exactly one gather.

Encodings (shared with ops/traverse.py ``_traverse_wide``):
- visit code ≥ 0:  wide-node visit, ``node << 8 | child_mask`` (mask of
  children still to visit — a fresh visit is mask 0xff, a stack resume is
  the remaining subset; one uniform code covers both).
- visit code < 0 (≠ EMPTY): leaf group, ``-(group + 1)``.
- empty child slot / idle lane: EMPTY = int32 min.

Node row (N, 56) f32 in child-SoA order [lox(8) loy(8) loz(8) hix(8)
hiy(8) hiz(8) codes(8)] and leaf rows in slot-SoA order: after the
kernel transposes the gathered rows to (56, R), every field is a
contiguous (8, R) / (max_leaf, R) slice, so the whole 8-child slab test
and the whole leaf Möller-Trumbore run as ONE pass of (8, R) tile math.
This layout is the difference between 0.15 and 1.05 Mrays/s at 1M
incoherent rays / 20k tris — per-child scalar-column passes re-read the
gathered buffer with strided access.  Padding slots carry NaN positions —
the intersection test can't pass.
"""

from __future__ import annotations

import numpy as np

from ray_tpu.scene.bvh import BVH2, LEAF_COUNT_BITS, LEAF_COUNT_MASK

WIDE = 8
EMPTY = np.int32(-0x80000000)


def _area(lo, hi):
    e = np.maximum(hi - lo, 0.0)
    return 2.0 * (e[0] * e[1] + e[1] * e[2] + e[2] * e[0])


def build_wbvh(bvh: BVH2, tri_soa_packed: np.ndarray,
               tri_vis: np.ndarray | None = None):
    """Collapse a BVH2 into 8-wide nodes + padded leaf groups.

    ``tri_soa_packed``: (T, 9) leaf-order triangle rows (pack_tri_soa
    "packed").  Returns dict with "nodes" (N, 56) f32, "leaves"
    (G, max_leaf*10 [+max_leaf if tri_vis]) f32.
    """
    max_leaf = bvh.max_leaf
    child = bvh.child
    c_lo = bvh.child_lo
    c_hi = bvh.child_hi

    # --- leaf groups: one padded group per BVH2 leaf reference ---
    leaf_rows = []

    def make_leaf(code):
        enc = -code - 1
        first = enc >> LEAF_COUNT_BITS
        count = enc & LEAF_COUNT_MASK
        # slot-SoA: 9 coord fields × max_leaf slots, then prim ids (+vis) —
        # contiguous (max_leaf, R) slices after the kernel transpose
        tri9 = np.full((max_leaf, 9), np.nan, np.float32)
        tri9[:count] = tri_soa_packed[first:first + count]
        prims = np.full(max_leaf, -1, np.int32)
        prims[:count] = np.arange(first, first + count, dtype=np.int32)
        vis = np.zeros(max_leaf, np.int32)
        if tri_vis is not None:
            vis[:count] = tri_vis[first:first + count]
        g = len(leaf_rows)
        parts = [np.ascontiguousarray(tri9.T).reshape(-1),
                 prims.view(np.float32)]
        if tri_vis is not None:
            parts.append(vis.view(np.float32))
        leaf_rows.append(np.concatenate(parts))
        return np.int32(-(g + 1))

    # --- wide nodes: greedy collapse, expand largest-area internal child ---
    nodes = []           # list of (codes[8] int32, lo[8,3], hi[8,3])
    todo = []            # (wide_id, bvh2_slot)

    def alloc_wide():
        nodes.append(None)
        return len(nodes) - 1

    root_w = alloc_wide()
    todo.append((root_w, 0))

    while todo:
        wid, slot = todo.pop()
        # children as (code, lo, hi, is_internal); expand internals until 8
        items = [
            (int(child[slot, s]), c_lo[slot, s], c_hi[slot, s])
            for s in range(2)
        ]
        # BVH2 always has 2 entries; an empty second leaf has count 0
        while len(items) < WIDE:
            # pick the internal child with the largest surface area
            best = -1
            best_a = -1.0
            for k, (code, lo, hi) in enumerate(items):
                if code >= 0:
                    a = _area(lo, hi)
                    if a > best_a:
                        best_a = a
                        best = k
            if best < 0:
                break
            code, _, _ = items.pop(best)
            for s in range(2):
                items.append(
                    (int(child[code, s]), c_lo[code, s], c_hi[code, s])
                )

        codes = np.full(WIDE, EMPTY, np.int32)
        lo8 = np.full((WIDE, 3), np.inf, np.float32)
        hi8 = np.full((WIDE, 3), -np.inf, np.float32)
        for k, (code, lo, hi) in enumerate(items):
            if code < 0:
                enc = -code - 1
                if (enc & LEAF_COUNT_MASK) == 0:
                    continue  # empty leaf slot
                codes[k] = make_leaf(code)
            else:
                w = alloc_wide()
                todo.append((w, code))
                codes[k] = np.int32((w << 8) | 0xFF)
            lo8[k] = lo
            hi8[k] = hi
        nodes[wid] = (codes, lo8, hi8)

    n = len(nodes)
    # child-SoA order: [lox(8) loy(8) loz(8) hix(8) hiy(8) hiz(8) codes(8)]
    # — after the kernel's (56, R) transpose each field is one contiguous
    # (8, R) slice, so the 8-child slab test runs as a single pass of
    # (8, R) tile math instead of 8 scalar-column passes
    packed = np.empty((n, 56), np.float32)
    for i, (codes, lo8, hi8) in enumerate(nodes):
        packed[i, 0:8] = lo8[:, 0]
        packed[i, 8:16] = lo8[:, 1]
        packed[i, 16:24] = lo8[:, 2]
        packed[i, 24:32] = hi8[:, 0]
        packed[i, 32:40] = hi8[:, 1]
        packed[i, 40:48] = hi8[:, 2]
        packed[i, 48:56] = codes.view(np.float32)

    if leaf_rows:
        leaves = np.stack(leaf_rows)
    else:
        leaves = np.zeros(
            (1, max_leaf * (10 + (1 if tri_vis is not None else 0))),
            np.float32,
        )
    return {
        "nodes": packed,
        "leaves": leaves,
        "n_leaf_cols": leaves.shape[1],
    }
