"""8-wide BVH for the TPU wavefront (reference ``wbvh_node_t``,
internal/Core.h:118, built by FlattenBVH_r, Core.cpp:722).

Why wide on TPU: traversal steps are dominated by *row-gather latency* —
a (R, k) gather costs the same for any k ≤ 128 (measured; the row rides one
vector register), so fetching 8 children per step instead of 2 cuts the
step count ~3× for near-free.  Leaves inline their ≤ max_leaf triangles
(positions + prim ids + visibility) into one padded "leaf group" row, so a
leaf visit is also exactly one gather.

Node rows and leaf rows live in ONE table (``rows``), nodes first: a
traversal step gathers exactly one row whatever the lane is doing and
interprets it as node or leaf by the visit code.  Before unification each
step paid two full-width gathers (every lane fetched both a node row and a
leaf row, one of them wasted) — the single biggest cost in big-scene
tracing.

Encodings (shared with ops/traverse.py ``_traverse_wide``):
- visit code ≥ 0:  wide-node visit, ``row << 8 | child_mask`` (mask of
  children still to visit — a fresh visit is mask 0xff, a stack resume is
  the remaining subset; one uniform code covers both).
- visit code < 0 (≠ EMPTY): leaf group at absolute row ``-(code + 1)``.
- empty child slot / idle lane: EMPTY = int32 min.

Row layout, width W = max(56, 11·max_leaf):
- node rows: child-SoA [lox(8) loy(8) loz(8) hix(8) hiy(8) hiz(8) codes(8)]
- leaf rows: slot-SoA [p0x(L) p0y(L) p0z(L) p1x(L) p1y(L) p1z(L) p2x(L)
  p2y(L) p2z(L) prim(L) vis(L)]
After the kernel transposes the gathered rows to (W, R), every field is a
contiguous (8, R) / (max_leaf, R) slice, so the whole 8-child slab test and
the whole leaf Möller-Trumbore run as ONE pass of tile math.  Padding slots
carry NaN positions — the intersection test can't pass; padding children
carry EMPTY codes and inverted boxes.
"""

from __future__ import annotations

import numpy as np

from ray_tpu.scene.bvh import BVH2, LEAF_COUNT_BITS, LEAF_COUNT_MASK

WIDE = 8
EMPTY = np.int32(-0x80000000)
NODE_COLS = 56


def _area(lo, hi):
    e = np.maximum(hi - lo, 0.0)
    return 2.0 * (e[0] * e[1] + e[1] * e[2] + e[2] * e[0])


def build_wbvh(bvh: BVH2, tri_soa_packed: np.ndarray,
               tri_vis: np.ndarray | None = None):
    """Collapse a BVH2 into 8-wide nodes + padded leaf groups in one table.

    ``tri_soa_packed``: (T, 9) leaf-order triangle rows (pack_tri_soa
    "packed").  Returns dict with "wrows" (N+G, W) f32 — node rows first.
    """
    max_leaf = bvh.max_leaf
    child = bvh.child
    c_lo = bvh.child_lo
    c_hi = bvh.child_hi
    width = max(NODE_COLS, 11 * max_leaf)

    # --- leaf groups: one padded group per BVH2 leaf reference ---
    leaf_rows = []

    def make_leaf(code):
        """Returns the leaf's group ordinal; final code is fixed up after
        the node count is known (leaf rows follow node rows)."""
        enc = -code - 1
        first = enc >> LEAF_COUNT_BITS
        count = enc & LEAF_COUNT_MASK
        # slot-SoA: 9 coord fields × max_leaf slots, then prim ids + vis —
        # contiguous (max_leaf, R) slices after the kernel transpose
        tri9 = np.full((max_leaf, 9), np.nan, np.float32)
        tri9[:count] = tri_soa_packed[first:first + count]
        prims = np.full(max_leaf, -1, np.int32)
        prims[:count] = np.arange(first, first + count, dtype=np.int32)
        vis = np.zeros(max_leaf, np.int32)
        vis[:count] = (
            0x7fffffff if tri_vis is None else tri_vis[first:first + count]
        )
        g = len(leaf_rows)
        row = np.zeros(width, np.float32)
        row[:9 * max_leaf] = np.ascontiguousarray(tri9.T).reshape(-1)
        row[9 * max_leaf:10 * max_leaf] = prims.view(np.float32)
        row[10 * max_leaf:11 * max_leaf] = vis.view(np.float32)
        leaf_rows.append(row)
        return g

    # --- wide nodes: greedy collapse, expand largest-area internal child ---
    nodes = []           # list of (codes[8] int32, leaf_mask[8], lo[8,3], hi[8,3])
    todo = []            # (wide_id, bvh2_slot)

    def alloc_wide():
        nodes.append(None)
        return len(nodes) - 1

    root_w = alloc_wide()
    todo.append((root_w, 0))

    while todo:
        wid, slot = todo.pop()
        # children as (code, lo, hi); expand internals until 8
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
        is_leaf = np.zeros(WIDE, np.bool_)
        lo8 = np.full((WIDE, 3), np.inf, np.float32)
        hi8 = np.full((WIDE, 3), -np.inf, np.float32)
        for k, (code, lo, hi) in enumerate(items):
            if code < 0:
                enc = -code - 1
                if (enc & LEAF_COUNT_MASK) == 0:
                    continue  # empty leaf slot
                codes[k] = make_leaf(code)
                is_leaf[k] = True
            else:
                w = alloc_wide()
                todo.append((w, code))
                codes[k] = w
            lo8[k] = lo
            hi8[k] = hi
        nodes[wid] = (codes, is_leaf, lo8, hi8)

    n = len(nodes)
    rows = np.zeros((n + len(leaf_rows), width), np.float32)
    for i, (codes, is_leaf, lo8, hi8) in enumerate(nodes):
        # fix up child codes now that the node count is known:
        # internal child w → visit code (w << 8) | 0xFF
        # leaf child g     → -( (n + g) + 1 )  (absolute row index)
        final = np.where(
            codes == EMPTY, EMPTY,
            np.where(is_leaf, -(n + codes + 1), (codes << 8) | 0xFF),
        ).astype(np.int32)
        rows[i, 0:8] = lo8[:, 0]
        rows[i, 8:16] = lo8[:, 1]
        rows[i, 16:24] = lo8[:, 2]
        rows[i, 24:32] = hi8[:, 0]
        rows[i, 32:40] = hi8[:, 1]
        rows[i, 40:48] = hi8[:, 2]
        rows[i, 48:56] = final.view(np.float32)
    if leaf_rows:
        rows[n:] = np.stack(leaf_rows)

    return {"wrows": rows}
