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


def _collapse_wide(bvh: BVH2, make_leaf):
    """Greedy 8-wide collapse of a BVH2: expand the largest-area internal
    child until 8 slots fill.  ``make_leaf(code)`` maps a BVH2 leaf code to
    a leaf ordinal (meaning is caller-defined).  Returns
    (nodes, n_leaf_refs): nodes is a list of (codes[8] raw int32 — wide-node
    ordinal if not leaf, make_leaf() result if leaf —, is_leaf[8], lo[8,3],
    hi[8,3])."""
    child = bvh.child
    c_lo = bvh.child_lo
    c_hi = bvh.child_hi

    nodes = []
    todo = []

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
    return nodes


def _node_rows(nodes, width, leaf_code_fn, node_base=0):
    """Assemble wide-node rows.  ``leaf_code_fn(ordinal)`` → final int32
    code for leaf children; internal children w become
    ``((w + node_base) << 8) | 0xFF``."""
    n = len(nodes)
    out = np.zeros((n, width), np.float32)
    for i, (codes, is_leaf, lo8, hi8) in enumerate(nodes):
        final = np.where(
            codes == EMPTY, EMPTY,
            np.where(is_leaf, leaf_code_fn(codes),
                     ((codes + node_base) << 8) | 0xFF),
        ).astype(np.int32)
        out[i, 0:8] = lo8[:, 0]
        out[i, 8:16] = lo8[:, 1]
        out[i, 16:24] = lo8[:, 2]
        out[i, 24:32] = hi8[:, 0]
        out[i, 32:40] = hi8[:, 1]
        out[i, 40:48] = hi8[:, 2]
        out[i, 48:56] = final.view(np.float32)
    return out


def _tri_leaf_rows(leaf_codes, tri_soa_packed, tri_vis, max_leaf, width):
    """Padded leaf-group rows for a list of BVH2 leaf codes (slot-SoA)."""
    rows = np.zeros((len(leaf_codes), width), np.float32)
    for g, code in enumerate(leaf_codes):
        enc = -code - 1
        first = enc >> LEAF_COUNT_BITS
        count = enc & LEAF_COUNT_MASK
        tri9 = np.full((max_leaf, 9), np.nan, np.float32)
        tri9[:count] = tri_soa_packed[first:first + count]
        prims = np.full(max_leaf, -1, np.int32)
        prims[:count] = np.arange(first, first + count, dtype=np.int32)
        vis = np.zeros(max_leaf, np.int32)
        vis[:count] = (
            0x7fffffff if tri_vis is None else tri_vis[first:first + count]
        )
        rows[g, :9 * max_leaf] = np.ascontiguousarray(tri9.T).reshape(-1)
        rows[g, 9 * max_leaf:10 * max_leaf] = prims.view(np.float32)
        rows[g, 10 * max_leaf:11 * max_leaf] = vis.view(np.float32)
    return rows


def build_wbvh(bvh: BVH2, tri_soa_packed: np.ndarray,
               tri_vis: np.ndarray | None = None):
    """Collapse a BVH2 into 8-wide nodes + padded leaf groups in one table.

    ``tri_soa_packed``: (T, 9) leaf-order triangle rows (pack_tri_soa
    "packed").  Returns dict with "wrows" (N+G, W) f32 — node rows first.
    """
    max_leaf = bvh.max_leaf
    width = max(NODE_COLS, 11 * max_leaf)

    leaf_codes = []

    def make_leaf(code):
        leaf_codes.append(code)
        return len(leaf_codes) - 1

    nodes = _collapse_wide(bvh, make_leaf)
    n = len(nodes)
    rows = np.concatenate([
        # leaf child g → absolute row -(n + g + 1)
        _node_rows(nodes, width, lambda g: -(n + g + 1)),
        _tri_leaf_rows(leaf_codes, tri_soa_packed, tri_vis, max_leaf, width),
    ]) if leaf_codes else _node_rows(nodes, width, lambda g: g)

    return {"wrows": rows}


# ---------------------------------------------------------------------------
# Wide two-level TLAS/BLAS (reference Traverse_TLAS over wbvh_node_t,
# CoreRef.cpp:2027 + BLAS nesting): TLAS wide nodes, one 14-col instance row
# per instance, and per-mesh wide BLAS tables — all merged into ONE row
# table so the traversal step stays a single gather.
#
# Code space (int32):
#   cur ≥ 0                     wide-node visit: (row << 8) | child_mask
#   cur < 0, v = -cur - 1:
#     v bit 28 set              instance row at v & 0x0FFFFFFF
#     else                      tri leaf-group row at v
#   RESTORE / EMPTY             sentinels (ops/traverse.py)
# Row budget: row < 2^23 (visit codes shift by 8).
#
# Instance row layout (cols 0..13): inv00..inv22 (row-major 3×3 of the
# object-from-world transform), invtx invty invtz, vis (bitcast i32),
# blas_root_visit_code (bitcast i32).
# ---------------------------------------------------------------------------

INST_ROW_BIT = 1 << 28


def build_wtlas(tlas: BVH2, inst_of_leaf: np.ndarray, inv: np.ndarray,
                inst_vis: np.ndarray, blas_list, blas_mesh_ids,
                blas_tri_base, tri_soa_packed: np.ndarray, max_leaf: int):
    """Build the unified wide two-level table.

    tlas: BVH2 over instance AABBs (max_leaf=1); ``inst_of_leaf[first]`` =
      instance index of the TLAS leaf starting at ``first`` (its
      prim_indices).
    inv: (I, 3, 4) object-from-world transforms; inst_vis: (I,) i32.
    blas_list: per-used-mesh BVH2 (object space, leaf codes LOCAL to the
      mesh); blas_mesh_ids: mesh id per entry; blas_tri_base: global
      leaf-order triangle offset per mesh id.
    tri_soa_packed: (T, 9) GLOBAL leaf-order triangle rows.
    """
    width = max(NODE_COLS, 11 * max_leaf, 14)
    n_inst = inv.shape[0]

    # --- collapse every BLAS first to learn its node/leaf row counts ---
    mesh_tables = {}
    for bvh, mid in zip(blas_list, blas_mesh_ids):
        leaf_codes = []

        def make_leaf(code, _lc=leaf_codes):
            _lc.append(code)
            return len(_lc) - 1

        nodes = _collapse_wide(bvh, make_leaf)
        mesh_tables[mid] = (nodes, leaf_codes, bvh.max_leaf)

    # --- row layout: [TLAS nodes | instance rows | mesh m nodes+leaves …]
    tlas_leaf_ids = []

    def tlas_leaf(code):
        enc = -code - 1
        first = enc >> LEAF_COUNT_BITS
        assert (enc & LEAF_COUNT_MASK) == 1
        tlas_leaf_ids.append(int(inst_of_leaf[first]))
        return len(tlas_leaf_ids) - 1

    tlas_nodes = _collapse_wide(tlas, tlas_leaf)
    n_tlas = len(tlas_nodes)
    inst_base = n_tlas
    base = inst_base + n_inst
    mesh_base = {}
    for mid, (nodes, leaf_codes, _) in mesh_tables.items():
        mesh_base[mid] = base
        base += len(nodes) + len(leaf_codes)
    total_rows = base
    assert total_rows < (1 << 23), total_rows

    parts = []
    # TLAS nodes: leaf ordinal g → instance tlas_leaf_ids[g]'s row.
    # leaf_code_fn receives the full raw codes array (non-leaf entries
    # included, masked by the caller) — clamp before indexing.
    ids = np.asarray(tlas_leaf_ids, np.int32) if tlas_leaf_ids else \
        np.zeros(1, np.int32)

    def tlas_leaf_code(g):
        gi = ids[np.clip(g, 0, ids.shape[0] - 1)]
        return -(((inst_base + gi) | INST_ROW_BIT) + 1)

    parts.append(_node_rows(tlas_nodes, width, tlas_leaf_code))
    # instance rows
    irows = np.zeros((n_inst, width), np.float32)
    irows[:, 0:9] = inv[:, :, :3].reshape(n_inst, 9)
    irows[:, 9:12] = inv[:, :, 3]
    irows[:, 12] = inst_vis.astype(np.int32).view(np.float32)
    parts.append(irows)
    # per-mesh BLAS tables
    for mid, (nodes, leaf_codes, blas_max_leaf) in mesh_tables.items():
        nb = mesh_base[mid]
        leaf_base = nb + len(nodes)
        parts.append(_node_rows(
            nodes, width, lambda g: -(leaf_base + g + 1), node_base=nb,
        ))
        # leaf codes are mesh-local; shift 'first' to the global tri order
        tb = blas_tri_base[mid]
        shifted = [
            -((((((-c - 1) >> LEAF_COUNT_BITS) + tb) << LEAF_COUNT_BITS)
               | ((-c - 1) & LEAF_COUNT_MASK)) + 1)
            for c in leaf_codes
        ]
        parts.append(_tri_leaf_rows(
            shifted, tri_soa_packed, None, blas_max_leaf, width,
        ))
    rows = np.concatenate(parts)
    assert rows.shape[0] == total_rows

    # root codes per mesh, written into the instance rows last
    root_code = np.array(
        [(mesh_base[mid] << 8) | 0xFF for mid in blas_mesh_ids], np.int32
    )
    mesh_root = {mid: rc for mid, rc in zip(blas_mesh_ids, root_code)}
    return {"wrows_tlas": rows}, mesh_root, inst_base


def finish_wtlas(table: dict, inst_mesh, mesh_root, inst_base):
    """Write each instance's BLAS-root visit code into its row (col 13)."""
    rows = table["wrows_tlas"]
    for i, mid in enumerate(inst_mesh):
        rows[inst_base + i, 13] = np.int32(mesh_root[mid]).view(np.float32)
    return table
