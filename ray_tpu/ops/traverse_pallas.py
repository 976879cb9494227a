"""Pallas TPU traversal kernels: rays and scene resident in VMEM.

The XLA wavefront traversal (ops/traverse.py) pays HBM round-trips at every
fusion boundary — ~45 ms per 2-Mray trace even on a 24-triangle scene.  These
kernels keep a block of rays *and* the whole scene (padded SoA columns) in
VMEM for the entire traversal, so the loop does pure VPU work with zero HBM
traffic; ray blocks whose traversal finishes early exit their while-loop
early (the TPU analogue of the reference's per-packet early-out,
internal/CoreSIMD.h traversal).

Per-lane random access uses the one Mosaic-supported gather shape —
``jnp.take_along_axis(table, idx, axis=0)`` with ``table.shape == idx.shape``
(sublane ``tpu.dynamic_gather``) — so every table is padded host-side to the
ray-block row count T and broadcast across the 128 lanes.  This caps the
Pallas path at scenes with ≤ T_MAX nodes/triangles (VMEM-resident scenes);
bigger scenes fall back to the XLA path.  The brute-force kernel
(``trace_brute_pallas``) skips the BVH entirely for ≤ 128-triangle scenes —
at that size testing every triangle is cheaper than any tree walk and needs
no gathers at all.

Both kernels return bit-identical hits to ops/traverse.py (same slab/
Möller–Trumbore math, same tie-breaking) — the equivalence tests in
tests/test_traverse_pallas.py enforce it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ray_tpu.ops.traverse import Hit
from ray_tpu.scene.bvh import LEAF_COUNT_BITS, LEAF_COUNT_MASK

LANES = 128
_EMPTY = np.int32(-0x80000000)

# Pallas path limits: tables padded to the ray-block row count; scenes
# exceeding them use the XLA fallback.
T_MAX_BRUTE = 128    # triangles, brute-force kernel
T_MAX_BVH = 512      # max(nodes, tris) rows, BVH kernel


def _ceil_to(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Brute-force kernel (tiny scenes): every lane tests every triangle.
# ---------------------------------------------------------------------------


def _brute_kernel(tri_refs, ox, oy, oz, dx, dy, dz, tmn, tmx, act,
                  o_t, o_prim, o_u, o_v, o_bf, *, n_tris, any_hit):
    p0x, p0y, p0z, p1x, p1y, p1z, p2x, p2y, p2z = tri_refs
    rox, roy, roz = ox[:], oy[:], oz[:]
    rdx, rdy, rdz = dx[:], dy[:], dz[:]
    t_min = tmn[:]
    active = act[:] != 0

    t_best = tmx[:]
    t_limit = tmx[:]
    prim = jnp.full(rox.shape, -1, jnp.int32)
    u_b = jnp.zeros(rox.shape, jnp.float32)
    v_b = jnp.zeros(rox.shape, jnp.float32)
    bf = jnp.zeros(rox.shape, jnp.int32)

    for k in range(n_tris):
        e1x = p1x[k][0] - p0x[k][0]
        e1y = p1y[k][0] - p0y[k][0]
        e1z = p1z[k][0] - p0z[k][0]
        e2x = p2x[k][0] - p0x[k][0]
        e2y = p2y[k][0] - p0y[k][0]
        e2z = p2z[k][0] - p0z[k][0]
        pvx = rdy * e2z - rdz * e2y
        pvy = rdz * e2x - rdx * e2z
        pvz = rdx * e2y - rdy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        valid_det = det != 0.0  # scale-invariant (see ops/intersect.py HIT_EPS note)
        inv_det = 1.0 / jnp.where(valid_det, det, 1.0)
        tvx = rox - p0x[k][0]
        tvy = roy - p0y[k][0]
        tvz = roz - p0z[k][0]
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (rdx * qvx + rdy * qvy + rdz * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        upper = t_limit if any_hit else t_best
        hit = (
            valid_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > t_min) & (t < upper) & active
        )
        t_best = jnp.where(hit, t, t_best)
        prim = jnp.where(hit, k, prim)
        u_b = jnp.where(hit, u, u_b)
        v_b = jnp.where(hit, v, v_b)
        bf = jnp.where(hit, (det < 0.0).astype(jnp.int32), bf)

    o_t[:] = t_best
    o_prim[:] = prim
    o_u[:] = u_b
    o_v[:] = v_b
    o_bf[:] = bf


@functools.partial(jax.jit, static_argnames=("n_tris", "any_hit", "block_rows"))
def _trace_brute_call(tris9, ro, rd, t_min, t_max, active, *, n_tris,
                      any_hit, block_rows):
    R = ro.shape[0]
    rows = _ceil_to(R, block_rows * LANES) // LANES
    grid = rows // block_rows

    def prep(x, fill):
        flat = jnp.full((rows * LANES,), fill, x.dtype).at[:R].set(x)
        return flat.reshape(rows, LANES)

    args = [
        prep(ro[:, 0], 0.0), prep(ro[:, 1], 0.0), prep(ro[:, 2], 0.0),
        prep(rd[:, 0], 1.0), prep(rd[:, 1], 0.0), prep(rd[:, 2], 0.0),
        prep(t_min, 0.0), prep(t_max, 0.0),
        prep(active.astype(jnp.int32), 0),
    ]
    ray_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((n_tris, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
    ]

    def kern(*refs):
        tri_refs = refs[:9]
        _brute_kernel(tri_refs, *refs[9:], n_tris=n_tris, any_hit=any_hit)

    t, prim, u, v, bf = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[tri_spec] * 9 + [ray_spec] * 9,
        out_specs=[ray_spec] * 5,
        out_shape=out_shape,
    )(*tris9, *args)

    def unprep(x):
        return x.reshape(-1)[:R]

    return tuple(unprep(x) for x in (t, prim, u, v, bf))


def trace_brute_pallas(tri_soa, ro, rd, t_min, t_max, active, *, n_tris,
                       any_hit=False, block_rows=256):
    """Brute-force all-triangles trace for VMEM-resident scenes (≤
    T_MAX_BRUTE tris).  tri_soa: leaf-order column dict from pack_tri_soa."""
    # traversal is a discrete decision procedure — fully detached (shading
    # re-derives differentiable quantities); pallas_call has no AD rule, so
    # detach the inputs too
    sg = jax.lax.stop_gradient
    ro, rd, t_min, t_max = sg(ro), sg(rd), sg(t_min), sg(t_max)
    tris9 = [
        sg(jnp.asarray(tri_soa[k])).reshape(-1, 1)
        for k in ("p0x", "p0y", "p0z", "p1x", "p1y", "p1z",
                  "p2x", "p2y", "p2z")
    ]
    t, prim, u, v, bf = _trace_brute_call(
        tris9, ro, rd, t_min, t_max, active,
        n_tris=n_tris, any_hit=any_hit, block_rows=block_rows,
    )
    return Hit(t=t, prim=prim, u=u, v=v, backface=bf != 0)


# ---------------------------------------------------------------------------
# BVH kernel: per-lane stack traversal with sublane dynamic_gather fetches.
# ---------------------------------------------------------------------------


def _gather(table_ref, idx, shape):
    """Per-lane gather from an (n_seg, 128)-packed table: entry e lives at
    row e>>7, lane e&127.  Mosaic supports lane-axis ``dynamic_gather``
    (one vreg along the gather dim = a 128-entry lookup); larger tables are
    covered segment-by-segment with selects."""
    n_seg = table_ref.shape[0]
    local = idx & (LANES - 1)
    if n_seg == 1:
        row = jnp.broadcast_to(table_ref[0:1, :], shape)
        return jnp.take_along_axis(row, local, axis=1)
    seg = idx >> 7
    out = None
    for s in range(n_seg):
        row = jnp.broadcast_to(table_ref[s:s + 1, :], shape)
        g = jnp.take_along_axis(row, local, axis=1)
        out = g if out is None else jnp.where(seg == s, g, out)
    return out


def _bvh_kernel(refs, *, B, stack_size, max_leaf, any_hit):
    (n_lo0x, n_lo0y, n_lo0z, n_hi0x, n_hi0y, n_hi0z,
     n_lo1x, n_lo1y, n_lo1z, n_hi1x, n_hi1y, n_hi1z,
     n_code0, n_code1,
     t_p0x, t_p0y, t_p0z, t_p1x, t_p1y, t_p1z, t_p2x, t_p2y, t_p2z,
     ox, oy, oz, dx, dy, dz, tmn, tmx, act,
     o_t, o_prim, o_u, o_v, o_bf, stack_ref) = refs

    shape = (B, LANES)
    g = lambda ref, idx: _gather(ref, idx, shape)
    nodes = {
        "lo0x": n_lo0x, "lo0y": n_lo0y, "lo0z": n_lo0z,
        "hi0x": n_hi0x, "hi0y": n_hi0y, "hi0z": n_hi0z,
        "lo1x": n_lo1x, "lo1y": n_lo1y, "lo1z": n_lo1z,
        "hi1x": n_hi1x, "hi1y": n_hi1y, "hi1z": n_hi1z,
        "code0": n_code0, "code1": n_code1,
    }
    tris = {
        "p0x": t_p0x, "p0y": t_p0y, "p0z": t_p0z,
        "p1x": t_p1x, "p1y": t_p1y, "p1z": t_p1z,
        "p2x": t_p2x, "p2y": t_p2y, "p2z": t_p2z,
    }

    rox, roy, roz = ox[:], oy[:], oz[:]
    rdx, rdy, rdz = dx[:], dy[:], dz[:]
    t_min = tmn[:]
    t_limit = tmx[:]
    active = act[:] != 0

    def safe_inv(v):
        tiny = jnp.where(v >= 0.0, jnp.float32(1e-7), jnp.float32(-1e-7))
        return 1.0 / jnp.where(jnp.abs(v) > 1e-7, v, tiny)

    ix, iy, iz = safe_inv(rdx), safe_inv(rdy), safe_inv(rdz)

    for s in range(stack_size):
        stack_ref[s] = jnp.full(shape, _EMPTY, jnp.int32)

    cur0 = jnp.where(active, 0, _EMPTY)
    sp0 = jnp.zeros(shape, jnp.int32)
    state0 = (
        jnp.int32(1), cur0, sp0,
        t_limit, jnp.full(shape, -1, jnp.int32),
        jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.int32),
    )

    def aabb(lox, loy, loz, hix, hiy, hiz, t_cap):
        tx0 = (lox - rox) * ix
        tx1 = (hix - rox) * ix
        ty0 = (loy - roy) * iy
        ty1 = (hiy - roy) * iy
        tz0 = (loz - roz) * iz
        tz1 = (hiz - roz) * iz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.maximum(jnp.minimum(tz0, tz1), t_min),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.minimum(jnp.maximum(tz0, tz1), t_cap),
        )
        return tn <= tf * 1.00000024, tn

    def body(state):
        _, cur, sp, t_best, prim, u_b, v_b, bf_b = state
        is_node = cur >= 0
        is_leaf = (cur < 0) & (cur != _EMPTY)
        node = jnp.where(is_node, cur, 0)

        h0, t0 = aabb(
            g(nodes["lo0x"], node), g(nodes["lo0y"], node),
            g(nodes["lo0z"], node), g(nodes["hi0x"], node),
            g(nodes["hi0y"], node), g(nodes["hi0z"], node),
            t_best,
        )
        h1, t1 = aabb(
            g(nodes["lo1x"], node), g(nodes["lo1y"], node),
            g(nodes["lo1z"], node), g(nodes["hi1x"], node),
            g(nodes["hi1y"], node), g(nodes["hi1z"], node),
            t_best,
        )
        c0 = g(nodes["code0"], node)
        c1 = g(nodes["code1"], node)
        near_is_0 = t0 <= t1
        near_code = jnp.where(near_is_0, c0, c1)
        far_code = jnp.where(near_is_0, c1, c0)
        # boolean selects as logic ops (Mosaic can't select on i1 vectors)
        near_hit = ((near_is_0 & h0) | (~near_is_0 & h1)) & is_node
        far_hit = ((near_is_0 & h1) | (~near_is_0 & h0)) & is_node

        push = near_hit & far_hit
        for s in range(stack_size):
            stack_ref[s] = jnp.where((sp == s) & push, far_code, stack_ref[s])
        sp = sp + push.astype(jnp.int32)
        from_node = jnp.where(
            near_hit, near_code, jnp.where(far_hit, far_code, _EMPTY)
        )

        leaf_v = jnp.where(is_leaf, cur, -1)
        first = (-leaf_v - 1) >> LEAF_COUNT_BITS
        count = (-leaf_v - 1) & LEAF_COUNT_MASK
        for k in range(max_leaf):
            valid = is_leaf & (k < count)
            tri = jnp.where(valid, first + k, 0)
            p0x = g(tris["p0x"], tri)
            p0y = g(tris["p0y"], tri)
            p0z = g(tris["p0z"], tri)
            e1x = g(tris["p1x"], tri) - p0x
            e1y = g(tris["p1y"], tri) - p0y
            e1z = g(tris["p1z"], tri) - p0z
            e2x = g(tris["p2x"], tri) - p0x
            e2y = g(tris["p2y"], tri) - p0y
            e2z = g(tris["p2z"], tri) - p0z
            pvx = rdy * e2z - rdz * e2y
            pvy = rdz * e2x - rdx * e2z
            pvz = rdx * e2y - rdy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            valid_det = det != 0.0  # scale-invariant (see ops/intersect.py HIT_EPS note)
            inv_det = 1.0 / jnp.where(valid_det, det, 1.0)
            tvx, tvy, tvz = rox - p0x, roy - p0y, roz - p0z
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v = (rdx * qvx + rdy * qvy + rdz * qvz) * inv_det
            t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            upper = t_limit if any_hit else t_best
            take = (
                valid_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > t_min) & (t < upper) & valid
            )
            t_best = jnp.where(take, t, t_best)
            prim = jnp.where(take, tri, prim)
            u_b = jnp.where(take, u, u_b)
            v_b = jnp.where(take, v, v_b)
            bf_b = jnp.where(take, (det < 0.0).astype(jnp.int32), bf_b)

        next_cur = jnp.where(is_node, from_node, _EMPTY)
        if any_hit:
            done = prim >= 0
            sp = jnp.where(done, 0, sp)
            next_cur = jnp.where(done, _EMPTY, next_cur)

        need_pop = (next_cur == _EMPTY) & (sp > 0)
        top = sp - 1
        popped = jnp.full(shape, _EMPTY, jnp.int32)
        for s in range(stack_size):
            popped = jnp.where(top == s, stack_ref[s], popped)
        next_cur = jnp.where(need_pop, popped, next_cur)
        sp = jnp.where(need_pop, sp - 1, sp)

        alive = jnp.any(next_cur != _EMPTY).astype(jnp.int32)
        return (alive, next_cur, sp, t_best, prim, u_b, v_b, bf_b)

    state = jax.lax.while_loop(
        lambda s: s[0] > 0, body, state0
    )
    _, _, _, t_best, prim, u_b, v_b, bf_b = state
    o_t[:] = t_best
    o_prim[:] = prim
    o_u[:] = u_b
    o_v[:] = v_b
    o_bf[:] = bf_b


@functools.partial(
    jax.jit,
    static_argnames=("node_segs", "tri_segs", "block_rows", "stack_size",
                     "max_leaf", "any_hit"),
)
def _trace_bvh_call(nodes14, tris9, ro, rd, t_min, t_max, active, *,
                    node_segs, tri_segs, block_rows, stack_size, max_leaf,
                    any_hit):
    B = block_rows
    R = ro.shape[0]
    rows = _ceil_to(R, B * LANES) // LANES
    grid = rows // B

    def prep(x, fill):
        flat = jnp.full((rows * LANES,), fill, x.dtype).at[:R].set(x)
        return flat.reshape(rows, LANES)

    args = [
        prep(ro[:, 0], 0.0), prep(ro[:, 1], 0.0), prep(ro[:, 2], 0.0),
        prep(rd[:, 0], 1.0), prep(rd[:, 1], 0.0), prep(rd[:, 2], 0.0),
        prep(t_min, 0.0), prep(t_max, 0.0),
        prep(active.astype(jnp.int32), 0),
    ]
    ray_spec = pl.BlockSpec((B, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    node_spec = pl.BlockSpec((node_segs, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((tri_segs, LANES), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
    ]

    def kern(*refs):
        _bvh_kernel(refs, B=B, stack_size=stack_size, max_leaf=max_leaf,
                    any_hit=any_hit)

    t, prim, u, v, bf = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[node_spec] * 14 + [tri_spec] * 9 + [ray_spec] * 9,
        out_specs=[ray_spec] * 5,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((stack_size, B, LANES), jnp.int32)],
    )(*nodes14, *tris9, *args)

    def unprep(x):
        return x.reshape(-1)[:R]

    return tuple(unprep(x) for x in (t, prim, u, v, bf))


_NODE_KEYS = ("lo0x", "lo0y", "lo0z", "hi0x", "hi0y", "hi0z",
              "lo1x", "lo1y", "lo1z", "hi1x", "hi1y", "hi1z",
              "code0", "code1")
_TRI_KEYS = ("p0x", "p0y", "p0z", "p1x", "p1y", "p1z", "p2x", "p2y", "p2z")


def _pack_segments(col, n_seg, fill):
    """Pad a 1-D column to n_seg*128 entries and lay it out (n_seg, 128):
    entry e at [e >> 7, e & 127] — the _gather layout."""
    col = jnp.asarray(col)
    out = jnp.full((n_seg * LANES,), fill, col.dtype)
    return out.at[: col.shape[0]].set(col).reshape(n_seg, LANES)


def _pad_tables(bvh_soa, tri_soa, node_segs, tri_segs):
    nodes14 = []
    for k in _NODE_KEYS:
        if k.startswith("code"):
            fill = _EMPTY
        elif k.startswith("hi"):
            fill = jnp.float32(1.0)
        else:
            fill = jnp.float32(0.0)
        nodes14.append(_pack_segments(bvh_soa[k], node_segs, fill))
    tris9 = [_pack_segments(tri_soa[k], tri_segs, jnp.float32(0.0))
             for k in _TRI_KEYS]
    return nodes14, tris9


def trace_bvh_pallas(bvh_soa, tri_soa, ro, rd, t_min, t_max, active, *,
                     max_leaf, stack_size, any_hit=False, block_rows=None):
    """Stack-based BVH2 traversal fully in VMEM.  Scene node/triangle columns
    are packed into 128-entry gather segments; rays stream through in
    (block_rows × 128)-lane blocks, each exiting its while-loop as soon as
    every ray in the block is done.  Default block size shrinks with
    ``max_leaf`` AND ``stack_size``: the unrolled leaf loop's live
    temporaries and the (stack, B, 128) scratch both scale the kernel's
    scoped-VMEM stack — fat-8 leaves at 256 rows measured 21.3 MB, and
    ~500-row scenes (stack ≥ 16) measured 19.8 MB against the 16 MB
    limit (caught by tests/test_traverse_pallas.py on hardware)."""
    if block_rows is None:
        block_rows = 128 if (max_leaf > 4 or stack_size >= 16) else 256
    sg = jax.lax.stop_gradient
    ro, rd, t_min, t_max = sg(ro), sg(rd), sg(t_min), sg(t_max)
    bvh_soa = jax.tree_util.tree_map(sg, bvh_soa)
    tri_soa = jax.tree_util.tree_map(sg, tri_soa)
    n_nodes = bvh_soa["code0"].shape[0]
    n_tris = tri_soa["p0x"].shape[0]
    node_segs = max(_ceil_to(n_nodes, LANES) // LANES, 1)
    tri_segs = max(_ceil_to(n_tris, LANES) // LANES, 1)
    assert max(n_nodes, n_tris) <= T_MAX_BVH, (n_nodes, n_tris, T_MAX_BVH)
    nodes14, tris9 = _pad_tables(bvh_soa, tri_soa, node_segs, tri_segs)
    t, prim, u, v, bf = _trace_bvh_call(
        nodes14, tris9, ro, rd, t_min, t_max, active,
        node_segs=node_segs, tri_segs=tri_segs, block_rows=block_rows,
        stack_size=stack_size, max_leaf=max_leaf, any_hit=any_hit,
    )
    return Hit(t=t, prim=prim, u=u, v=v, backface=bf != 0)


# ---------------------------------------------------------------------------
# Wide two-level TLAS/BLAS kernel: the unified wtlas row table AND all ray/
# traversal state VMEM-resident.  Port of ops/traverse._traverse_wide_tlas
# (bit-identical codes/selects) — the XLA while-loop round-trips ~30 (R,)
# state columns plus the (stack, R) stack through HBM on every traversal
# step; here state lives in registers/VMEM scratch for the whole walk.
# Applicable when the unified row table fits the gather budget
# (rows <= T_MAX_TLAS_ROWS): heavily instanced scenes (the 330k-tri
# colonnade's unique-geometry table is a few thousand rows) qualify even
# though their flattened triangle count is far beyond T_MAX_BVH.
# ---------------------------------------------------------------------------

T_MAX_TLAS_ROWS = 8192  # unified rows; f32+i32 tables ≈ 8k*W*8B ≈ 3.6 MB


def _tlas_kernel(refs, *, B, n_seg, stack_size, max_leaf, any_hit):
    from ray_tpu.scene.wbvh import INST_ROW_BIT

    (rows_f, rows_i,
     wox_r, woy_r, woz_r, wdx_r, wdy_r, wdz_r, tmn, tmx, act, msk,
     o_t, o_prim, o_u, o_v, o_bf, o_inst, stack_ref) = refs

    shape = (B, LANES)
    RESTORE = jnp.int32(-0x7ffffffe)

    def gf(c, idx):
        local = idx & (LANES - 1)
        if n_seg == 1:
            row = jnp.broadcast_to(rows_f[c, 0:1, :], shape)
            return jnp.take_along_axis(row, local, axis=1)
        seg = idx >> 7
        out = None
        for s in range(n_seg):
            row = jnp.broadcast_to(rows_f[c, s:s + 1, :], shape)
            g = jnp.take_along_axis(row, local, axis=1)
            out = g if out is None else jnp.where(seg == s, g, out)
        return out

    def gi(c, idx):
        local = idx & (LANES - 1)
        if n_seg == 1:
            row = jnp.broadcast_to(rows_i[c, 0:1, :], shape)
            return jnp.take_along_axis(row, local, axis=1)
        seg = idx >> 7
        out = None
        for s in range(n_seg):
            row = jnp.broadcast_to(rows_i[c, s:s + 1, :], shape)
            g = jnp.take_along_axis(row, local, axis=1)
            out = g if out is None else jnp.where(seg == s, g, out)
        return out

    wox, woy, woz = wox_r[:], woy_r[:], woz_r[:]
    wdx, wdy, wdz = wdx_r[:], wdy_r[:], wdz_r[:]
    t_min = tmn[:]
    t_limit = tmx[:]
    active = act[:] != 0
    ray_mask = msk[:]

    def safe_inv(v):
        tiny = jnp.where(v >= 0.0, jnp.float32(1e-7), jnp.float32(-1e-7))
        return 1.0 / jnp.where(jnp.abs(v) > 1e-7, v, tiny)

    wix, wiy, wiz = safe_inv(wdx), safe_inv(wdy), safe_inv(wdz)

    for s in range(stack_size):
        stack_ref[s] = jnp.full(shape, _EMPTY, jnp.int32)

    cur0 = jnp.where(active, jnp.int32(0xFF), _EMPTY)
    zero_f = jnp.zeros(shape, jnp.float32)
    zero_i = jnp.zeros(shape, jnp.int32)
    state0 = (
        jnp.int32(1), cur0, zero_i, zero_i,          # alive, cur, sp, cur_inst
        wox, woy, woz, wdx, wdy, wdz, wix, wiy, wiz,  # current-space ray
        t_limit, jnp.full(shape, -1, jnp.int32),      # hit t, prim
        zero_f, zero_f, zero_i,                       # u, v, bf
        jnp.full(shape, -1, jnp.int32),               # inst
    )

    def body(state):
        (_, cur, sp, cur_inst, ox, oy, oz, dx, dy, dz, ix, iy, iz,
         t_best, prim, u_b, v_b, bf_b, inst_b) = state
        is_node = cur >= 0
        neg = (cur < 0) & (cur != _EMPTY) & (cur != RESTORE)
        is_restore = cur == RESTORE
        v_dec = jnp.where(neg, -cur - 1, 0)
        is_inst = neg & ((v_dec & INST_ROW_BIT) != 0)
        is_tri = neg & (~is_inst)
        node = jnp.where(is_node, cur >> 8, 0)
        mask8 = jnp.where(is_node, cur & 0xFF, 0)
        ridx = jnp.where(is_node, node, v_dec & (INST_ROW_BIT - 1))

        # ---- one gather per needed column, reused by all three row
        # interpretations (node bbox = instance xform = tri vertex cols) --
        L = max_leaf
        fcols = [gf(c, ridx) for c in range(48)]
        codes = [gi(48 + c, ridx) for c in range(8)]
        ivis = gi(12, ridx)
        iroot = gi(13, ridx)
        prims = [gi(9 * L + k, ridx) for k in range(L)]

        # ---- wide-node interpretation: unrolled over 8 children ----
        best_t = jnp.full(shape, jnp.inf, jnp.float32)
        best_code = jnp.full(shape, _EMPTY, jnp.int32)
        best_bit = zero_i
        rem = zero_i
        hit_any = jnp.zeros(shape, jnp.bool_)
        cap = t_best
        for c in range(8):
            lox, loy, loz = fcols[c], fcols[8 + c], fcols[16 + c]
            hix, hiy, hiz = fcols[24 + c], fcols[32 + c], fcols[40 + c]
            code_c = codes[c]
            tx0 = (lox - ox) * ix
            tx1 = (hix - ox) * ix
            ty0 = (loy - oy) * iy
            ty1 = (hiy - oy) * iy
            tz0 = (loz - oz) * iz
            tz1 = (hiz - oz) * iz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.maximum(jnp.minimum(tz0, tz1), t_min),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.minimum(jnp.maximum(tz0, tz1), cap),
            )
            in_mask = ((mask8 >> c) & 1) != 0
            ok = (tn <= tf * 1.00000024) & in_mask & (code_c != _EMPTY) \
                & is_node
            # strict < keeps the FIRST minimal child — jnp.argmin semantics
            better = ok & (tn < best_t)
            best_t = jnp.where(better, tn, best_t)
            best_code = jnp.where(better, code_c, best_code)
            best_bit = jnp.where(better, jnp.int32(1) << c, best_bit)
            rem = rem | jnp.where(ok, jnp.int32(1) << c, 0)
            hit_any = hit_any | ok
        rem = rem & (~best_bit)
        resume = (node << 8) | rem
        push_node = is_node & hit_any & (rem != 0)
        from_node = jnp.where(is_node & hit_any, best_code, _EMPTY)

        # ---- instance-row interpretation ----
        enter = is_inst & ((ivis & ray_mask) != 0)
        eox = fcols[0] * wox + fcols[1] * woy + fcols[2] * woz + fcols[9]
        eoy = fcols[3] * wox + fcols[4] * woy + fcols[5] * woz + fcols[10]
        eoz = fcols[6] * wox + fcols[7] * woy + fcols[8] * woz + fcols[11]
        edx = fcols[0] * wdx + fcols[1] * wdy + fcols[2] * wdz
        edy = fcols[3] * wdx + fcols[4] * wdy + fcols[5] * wdz
        edz = fcols[6] * wdx + fcols[7] * wdy + fcols[8] * wdz
        ii = v_dec & (INST_ROW_BIT - 1)

        # ---- push: node resume or RESTORE marker ----
        push = push_node | enter
        push_val = jnp.where(enter, RESTORE, resume)
        for s in range(stack_size):
            stack_ref[s] = jnp.where((sp == s) & push, push_val,
                                     stack_ref[s])
        sp = sp + push.astype(jnp.int32)

        # ---- current-space ray update ----
        ox = jnp.where(enter, eox, jnp.where(is_restore, wox, ox))
        oy = jnp.where(enter, eoy, jnp.where(is_restore, woy, oy))
        oz = jnp.where(enter, eoz, jnp.where(is_restore, woz, oz))
        dx = jnp.where(enter, edx, jnp.where(is_restore, wdx, dx))
        dy = jnp.where(enter, edy, jnp.where(is_restore, wdy, dy))
        dz = jnp.where(enter, edz, jnp.where(is_restore, wdz, dz))
        ix = jnp.where(enter, safe_inv(edx), jnp.where(is_restore, wix, ix))
        iy = jnp.where(enter, safe_inv(edy), jnp.where(is_restore, wiy, iy))
        iz = jnp.where(enter, safe_inv(edz), jnp.where(is_restore, wiz, iz))
        cur_inst = jnp.where(enter, ii, cur_inst)

        # ---- tri-leaf interpretation (argmin-free best chain) ----
        upper0 = t_limit if any_hit else t_best
        lt = jnp.full(shape, jnp.inf, jnp.float32)
        lprim = jnp.full(shape, -1, jnp.int32)
        lu = zero_f
        lv = zero_f
        lbf = zero_i  # int32: Mosaic can't select i1 vectors
        for k in range(L):
            p0x, p0y, p0z = fcols[k], fcols[L + k], fcols[2 * L + k]
            p1x, p1y, p1z = fcols[3 * L + k], fcols[4 * L + k], \
                fcols[5 * L + k]
            p2x, p2y, p2z = fcols[6 * L + k], fcols[7 * L + k], \
                fcols[8 * L + k]
            prim_k = prims[k]
            e1x, e1y, e1z = p1x - p0x, p1y - p0y, p1z - p0z
            e2x, e2y, e2z = p2x - p0x, p2y - p0y, p2z - p0z
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            valid_det = det != 0.0
            inv_det = 1.0 / jnp.where(valid_det, det, 1.0)
            tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            th = (
                valid_det & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                & (tt > t_min) & (tt < upper0)
            )
            hit_k = th & is_tri & (prim_k >= 0)
            better = hit_k & (tt < lt)
            lt = jnp.where(better, tt, lt)
            lprim = jnp.where(better, prim_k, lprim)
            lu = jnp.where(better, uu, lu)
            lv = jnp.where(better, vv, lv)
            lbf = jnp.where(better, (det < 0.0).astype(jnp.int32), lbf)
        take = (lprim >= 0) & (lt < t_best)
        t_best = jnp.where(take, lt, t_best)
        prim = jnp.where(take, lprim, prim)
        u_b = jnp.where(take, lu, u_b)
        v_b = jnp.where(take, lv, v_b)
        bf_b = jnp.where(take, lbf, bf_b)
        inst_b = jnp.where(take, cur_inst, inst_b)

        next_cur = jnp.where(
            is_node, from_node, jnp.where(enter, iroot, _EMPTY)
        )
        if any_hit:
            done = prim >= 0
            sp = jnp.where(done, 0, sp)
            next_cur = jnp.where(done, _EMPTY, next_cur)

        need_pop = (next_cur == _EMPTY) & (sp > 0)
        top = sp - 1
        popped = jnp.full(shape, _EMPTY, jnp.int32)
        for s in range(stack_size):
            popped = jnp.where(top == s, stack_ref[s], popped)
        next_cur = jnp.where(need_pop, popped, next_cur)
        sp = jnp.where(need_pop, sp - 1, sp)

        alive = jnp.any(next_cur != _EMPTY).astype(jnp.int32)
        return (alive, next_cur, sp, cur_inst,
                ox, oy, oz, dx, dy, dz, ix, iy, iz,
                t_best, prim, u_b, v_b, bf_b, inst_b)

    state = jax.lax.while_loop(lambda s: s[0] > 0, body, state0)
    (_, _, _, _, _, _, _, _, _, _, _, _, _,
     t_best, prim, u_b, v_b, bf_b, inst_b) = state
    o_t[:] = t_best
    o_prim[:] = prim
    o_u[:] = u_b
    o_v[:] = v_b
    o_bf[:] = bf_b
    o_inst[:] = inst_b


@functools.partial(
    jax.jit,
    static_argnames=("n_seg", "width", "block_rows", "stack_size",
                     "max_leaf", "any_hit", "interpret"),
)
def _trace_tlas_call(rows, ro, rd, t_min, t_max, active, ray_mask, *,
                     n_seg, width, block_rows, stack_size, max_leaf,
                     any_hit, interpret=False):
    B = block_rows
    R = ro.shape[0]
    rrows = _ceil_to(R, B * LANES) // LANES
    grid = rrows // B

    # (N, W) → (W, n_seg, 128): entry e of column c at [c, e>>7, e&127]
    N = rows.shape[0]
    pad = jnp.zeros((n_seg * LANES - N, rows.shape[1]), rows.dtype)
    packed = jnp.concatenate([rows, pad], axis=0)
    packed = packed.reshape(n_seg, LANES, rows.shape[1]).transpose(2, 0, 1)
    packed_i = jax.lax.bitcast_convert_type(packed, jnp.int32)

    def prep(x, fill):
        flat = jnp.full((rrows * LANES,), fill, x.dtype).at[:R].set(x)
        return flat.reshape(rrows, LANES)

    args = [
        prep(ro[:, 0], 0.0), prep(ro[:, 1], 0.0), prep(ro[:, 2], 0.0),
        prep(rd[:, 0], 1.0), prep(rd[:, 1], 0.0), prep(rd[:, 2], 0.0),
        prep(t_min, 0.0), prep(t_max, 0.0),
        prep(active.astype(jnp.int32), 0),
        prep(ray_mask, 0),
    ]
    ray_spec = pl.BlockSpec((B, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((width, n_seg, LANES), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((rrows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rrows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rrows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rrows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rrows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rrows, LANES), jnp.int32),
    ]

    def kern(*refs):
        _tlas_kernel(refs, B=B, n_seg=n_seg, stack_size=stack_size,
                     max_leaf=max_leaf, any_hit=any_hit)

    t, prim, u, v, bf, inst = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[rows_spec, rows_spec] + [ray_spec] * 10,
        out_specs=[ray_spec] * 6,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((stack_size, B, LANES), jnp.int32)],
        interpret=interpret,
    )(packed, packed_i, *args)

    def unprep(x):
        return x.reshape(-1)[:R]

    return tuple(unprep(x) for x in (t, prim, u, v, bf, inst))


def trace_tlas_pallas(wn, ro, rd, t_min, t_max, active, ray_mask, *,
                      max_leaf, stack_size, any_hit=False, block_rows=8,
                      interpret=False):
    """VMEM-resident wide TLAS/BLAS traversal (see module section comment).

    Returns (t, prim, u, v, backface int, inst ROW index) — the caller
    rebases inst by ``winst_base`` exactly like the XLA machine."""
    sg = jax.lax.stop_gradient
    rows = sg(wn["wrows_tlas"])
    N, W = rows.shape
    assert N <= T_MAX_TLAS_ROWS, (N, T_MAX_TLAS_ROWS)
    n_seg = max(_ceil_to(N, LANES) // LANES, 1)
    if ray_mask is None:
        ray_mask = jnp.full(ro.shape[:1], 0x7fffffff, jnp.int32)
    return _trace_tlas_call(
        rows, sg(ro), sg(rd), sg(t_min), sg(t_max), active, ray_mask,
        n_seg=n_seg, width=W, block_rows=block_rows,
        stack_size=stack_size, max_leaf=max_leaf, any_hit=any_hit,
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Binned flatten kernel: big un-instanced scenes via per-block subtree DMA.
#
# The VMEM-resident BVH kernel above caps at T_MAX_BVH rows; the reference's
# device path handles arbitrary flattened scenes in one kernel
# (internal/RendererVK.cpp:580-595).  Here the scene's BVH2 is cut into
# ≤SUB_ROWS-row subtrees (scene/bvh.py partition_subtrees) whose slabs live
# in HBM; each (B × 128)-ray block walks subtrees in per-ray near-to-far
# order, DMA-ing one slab at a time into VMEM scratch:
#
#   round:  per-lane next subtree = lexicographic-min (t_enter, sid) over
#           the S subtree AABBs (brute fori_loop over SMEM scalars — S is a
#           few hundred) strictly after the lane's frontier and closer than
#           its current best hit;
#           block subtree = min pending sid; DMA its slab; lanes whose next
#           matches walk it (the same stack walk as _bvh_kernel, local
#           codes, prim rebased by the subtree's tri offset); frontier
#           advances.  Rays pre-sorted by first subtree keep blocks
#           coherent, so most blocks need only a few DMAs.
#
# Bit-identical to the XLA wavefront on the same scene by the same argument
# as the other kernels: same AABB/Möller-Trumbore math, and the
# near-to-far + shrinking-t_best visit order cannot change the closest hit.
#
# MEASURED VERDICT (r5, real chip, 120k tris / 131k rays): bit-exact but
# SLOWER than the XLA wavefront — 3.3 s vs 1.9 s on a uniform triangle
# cloud, 5.5 s vs 0.24 s on a structured city grid.  The block-serialized
# subtree rounds are structural: a long/grazing ray enters O(sqrt(S))
# subtree AABBs and every visit costs its block a full round (S-iteration
# selection + DMA + walk) even though the in-slab walk exits in a few
# steps; the global-memory XLA walk pays one row-gather per step with no
# per-subtree overhead and wins on exactly those rays.  Larger slabs
# (1024 rows) trade fewer rounds for 2x fetch cost and lose more.  The
# kernel therefore stays OPT-IN (finalize(pallas_binned=True) or direct
# calls); the default dispatch keeps the XLA machine for scenes past the
# VMEM caps.  Kept as a verified capability + the measured design study.
# ---------------------------------------------------------------------------

SUB_SEGS = 4                    # 512 rows per subtree slab
SUB_ROWS = SUB_SEGS * LANES
_F_COLS = ("lo0x", "lo0y", "lo0z", "hi0x", "hi0y", "hi0z",
           "lo1x", "lo1y", "lo1z", "hi1x", "hi1y", "hi1z")
# slab strides are padded to a multiple of 8 rows: DMA transfers with a
# non-8-aligned sublane row count crash the chip (bisected on hardware —
# (84,128) copies fault, (80/88/96,128) succeed)
CF = _ceil_to((12 + 9) * SUB_SEGS, 8)   # f32 rows: node bounds + tri verts
CI = _ceil_to(3 * SUB_SEGS, 8)          # i32 rows: codes + tri id map


def pack_binned_scene(bvh, tri_soa, max_rows=SUB_ROWS):
    """Host-side: partition + pack slabs for :func:`trace_flat_binned`.

    Returns a dict of numpy arrays (stored on the scene):
      slab_f (S*CF, 128) f32, slab_i (S*CI, 128) i32 (codes + local→global
      tri map), sub_lo/sub_hi (S, 3); static ints ride as shapes.
    """
    from ray_tpu.scene.bvh import partition_subtrees, pack_bvh_soa

    part = partition_subtrees(bvh, max_rows=max_rows)
    S = len(part["sub_local"])
    slab_f = np.zeros((S * CF, LANES), np.float32)
    slab_i = np.full((S * CI, LANES), _EMPTY, np.int32)
    sub_lo = np.zeros((S, 3), np.float32)
    sub_hi = np.zeros((S, 3), np.float32)
    for s, sub in enumerate(part["sub_local"]):
        cols = pack_bvh_soa(sub)
        nn = sub.child.shape[0]
        assert nn <= max_rows
        for ci, k in enumerate(_F_COLS):
            seg = np.zeros((SUB_SEGS, LANES), np.float32)
            # unhit default for far bounds: lo=0, hi=-1 (inverted, misses)
            if k.startswith("hi"):
                seg -= 1.0
            flat = seg.reshape(-1)
            flat[:nn] = cols[k]
            slab_f[s * CF + ci * SUB_SEGS:s * CF + (ci + 1) * SUB_SEGS] = (
                flat.reshape(SUB_SEGS, LANES)
            )
        ids = part["sub_tri_ids"][s]
        tc = ids.shape[0]
        for vi, k in enumerate(
            ("p0x", "p0y", "p0z", "p1x", "p1y", "p1z", "p2x", "p2y", "p2z")
        ):
            flat = np.zeros(SUB_ROWS, np.float32)
            flat[:tc] = np.asarray(tri_soa[k])[ids]
            slab_f[s * CF + (12 + vi) * SUB_SEGS:
                   s * CF + (12 + vi + 1) * SUB_SEGS] = (
                flat.reshape(SUB_SEGS, LANES)
            )
        for ci, k in enumerate(("code0", "code1")):
            flat = np.full(SUB_ROWS, _EMPTY, np.int32)
            flat[:nn] = cols[k]
            slab_i[s * CI + ci * SUB_SEGS:s * CI + (ci + 1) * SUB_SEGS] = (
                flat.reshape(SUB_SEGS, LANES)
            )
        gmap = np.zeros(SUB_ROWS, np.int32)
        gmap[:tc] = ids
        slab_i[s * CI + 2 * SUB_SEGS:s * CI + 3 * SUB_SEGS] = (
            gmap.reshape(SUB_SEGS, LANES)
        )
        sub_lo[s] = np.minimum(sub.child_lo[0, 0], sub.child_lo[0, 1])
        sub_hi[s] = np.maximum(sub.child_hi[0, 0], sub.child_hi[0, 1])
        # single-leaf subtree guard: child 1 may be an inverted empty box
        if (sub.child_hi[0, 1] < sub.child_lo[0, 1]).any():
            sub_lo[s] = sub.child_lo[0, 0]
            sub_hi[s] = sub.child_hi[0, 0]
    return {
        "slab_f": slab_f,
        "slab_i": slab_i,
        "sub_lo": sub_lo,
        "sub_hi": sub_hi,
        # static ints ride as array SHAPES so the dict can live in a traced
        # scene pytree: S = slab_i.shape[0] // CI; stack via this dummy
        "stack_arr": np.zeros(int(part["depth"]) + 2, np.int8),
    }


def _binned_kernel(refs, *, B, S, stack_size, max_leaf, any_hit):
    (slab_f_hbm, slab_i_hbm, aabb_ref,
     ox, oy, oz, dx, dy, dz, tmn, tmx, act,
     o_t, o_prim, o_u, o_v, o_bf,
     slabf, slabi, stack_ref, sem) = refs

    shape = (B, LANES)
    BIG = jnp.float32(3.4e38)

    rox, roy, roz = ox[:], oy[:], oz[:]
    rdx, rdy, rdz = dx[:], dy[:], dz[:]
    t_min = tmn[:]
    t_limit = tmx[:]
    active = act[:] != 0

    def safe_inv(v):
        tiny = jnp.where(v >= 0.0, jnp.float32(1e-7), jnp.float32(-1e-7))
        return 1.0 / jnp.where(jnp.abs(v) > 1e-7, v, tiny)

    ix, iy, iz = safe_inv(rdx), safe_inv(rdy), safe_inv(rdz)

    def aabb_t(lox, loy, loz, hix, hiy, hiz, t_cap):
        tx0 = (lox - rox) * ix
        tx1 = (hix - rox) * ix
        ty0 = (loy - roy) * iy
        ty1 = (hiy - roy) * iy
        tz0 = (loz - roz) * iz
        tz1 = (hiz - roz) * iz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.maximum(jnp.minimum(tz0, tz1), t_min),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.minimum(jnp.maximum(tz0, tz1), t_cap),
        )
        return tn <= tf * 1.00000024, tn

    def gather_slab(ref, base_row, idx):
        """idx ∈ [0, SUB_ROWS) → value from the 4-segment column at
        ``base_row`` of the slab scratch."""
        local = idx & (LANES - 1)
        seg = idx >> 7
        out = None
        for s in range(SUB_SEGS):
            row = jnp.broadcast_to(ref[base_row + s:base_row + s + 1, :],
                                   shape)
            g = jnp.take_along_axis(row, local, axis=1)
            out = g if out is None else jnp.where(seg == s, g, out)
        return out

    def next_subtree(f_t, f_sid, t_best, want):
        """Lexicographic-min (t_enter, sid) strictly after (f_t, f_sid),
        with t_enter < t_best, over all S subtree AABBs."""

        def body(s, carry):
            bt, bs = carry
            lox = aabb_ref[0, s]
            loy = aabb_ref[1, s]
            loz = aabb_ref[2, s]
            hix = aabb_ref[3, s]
            hiy = aabb_ref[4, s]
            hiz = aabb_ref[5, s]
            hit, tn = aabb_t(lox, loy, loz, hix, hiy, hiz, t_best)
            after = (tn > f_t) | ((tn == f_t) & (s > f_sid))
            better = (tn < bt) | ((tn == bt) & (s < bs))
            take = want & hit & after & better
            bt = jnp.where(take, tn, bt)
            bs = jnp.where(take, s, bs)
            return bt, bs

        bt0 = jnp.full(shape, BIG, jnp.float32)
        bs0 = jnp.full(shape, 0x7FFFFFFF, jnp.int32)
        bt, bs = jax.lax.fori_loop(0, S, body, (bt0, bs0))
        return bt, jnp.where(bs == 0x7FFFFFFF, -1, bs)

    def walk_slab(participate, t_best, prim, u_b, v_b, bf_b):
        """The _bvh_kernel stack walk against the slab scratch."""
        for s in range(stack_size):
            stack_ref[s] = jnp.full(shape, _EMPTY, jnp.int32)
        cur0 = jnp.where(participate, 0, _EMPTY)
        sp0 = jnp.zeros(shape, jnp.int32)

        def body(state):
            _, cur, sp, t_best, prim, u_b, v_b, bf_b = state
            is_node = cur >= 0
            is_leaf = (cur < 0) & (cur != _EMPTY)
            node = jnp.where(is_node, cur, 0)

            h0, t0 = aabb_t(
                gather_slab(slabf, 0 * SUB_SEGS, node).astype(jnp.float32),
                gather_slab(slabf, 1 * SUB_SEGS, node),
                gather_slab(slabf, 2 * SUB_SEGS, node),
                gather_slab(slabf, 3 * SUB_SEGS, node),
                gather_slab(slabf, 4 * SUB_SEGS, node),
                gather_slab(slabf, 5 * SUB_SEGS, node),
                t_best,
            )
            h1, t1 = aabb_t(
                gather_slab(slabf, 6 * SUB_SEGS, node),
                gather_slab(slabf, 7 * SUB_SEGS, node),
                gather_slab(slabf, 8 * SUB_SEGS, node),
                gather_slab(slabf, 9 * SUB_SEGS, node),
                gather_slab(slabf, 10 * SUB_SEGS, node),
                gather_slab(slabf, 11 * SUB_SEGS, node),
                t_best,
            )
            c0 = gather_slab(slabi, 0 * SUB_SEGS, node)
            c1 = gather_slab(slabi, 1 * SUB_SEGS, node)
            near_is_0 = t0 <= t1
            near_code = jnp.where(near_is_0, c0, c1)
            far_code = jnp.where(near_is_0, c1, c0)
            near_hit = ((near_is_0 & h0) | (~near_is_0 & h1)) & is_node
            far_hit = ((near_is_0 & h1) | (~near_is_0 & h0)) & is_node

            push = near_hit & far_hit
            for s in range(stack_size):
                stack_ref[s] = jnp.where(
                    (sp == s) & push, far_code, stack_ref[s])
            sp = sp + push.astype(jnp.int32)
            from_node = jnp.where(
                near_hit, near_code, jnp.where(far_hit, far_code, _EMPTY)
            )

            leaf_v = jnp.where(is_leaf, cur, -1)
            first = (-leaf_v - 1) >> LEAF_COUNT_BITS
            count = (-leaf_v - 1) & LEAF_COUNT_MASK
            for k in range(max_leaf):
                valid = is_leaf & (k < count)
                tri = jnp.where(valid, first + k, 0)
                p0x = gather_slab(slabf, 12 * SUB_SEGS, tri)
                p0y = gather_slab(slabf, 13 * SUB_SEGS, tri)
                p0z = gather_slab(slabf, 14 * SUB_SEGS, tri)
                e1x = gather_slab(slabf, 15 * SUB_SEGS, tri) - p0x
                e1y = gather_slab(slabf, 16 * SUB_SEGS, tri) - p0y
                e1z = gather_slab(slabf, 17 * SUB_SEGS, tri) - p0z
                e2x = gather_slab(slabf, 18 * SUB_SEGS, tri) - p0x
                e2y = gather_slab(slabf, 19 * SUB_SEGS, tri) - p0y
                e2z = gather_slab(slabf, 20 * SUB_SEGS, tri) - p0z
                pvx = rdy * e2z - rdz * e2y
                pvy = rdz * e2x - rdx * e2z
                pvz = rdx * e2y - rdy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                valid_det = det != 0.0
                inv_det = 1.0 / jnp.where(valid_det, det, 1.0)
                tvx, tvy, tvz = rox - p0x, roy - p0y, roz - p0z
                u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                v = (rdx * qvx + rdy * qvy + rdz * qvz) * inv_det
                t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                upper = t_limit if any_hit else t_best
                take = (
                    valid_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                    & (t > t_min) & (t < upper) & valid
                )
                t_best = jnp.where(take, t, t_best)
                prim = jnp.where(
                    take, gather_slab(slabi, 2 * SUB_SEGS, tri), prim)
                u_b = jnp.where(take, u, u_b)
                v_b = jnp.where(take, v, v_b)
                bf_b = jnp.where(take, (det < 0.0).astype(jnp.int32), bf_b)

            next_cur = jnp.where(is_node, from_node, _EMPTY)
            if any_hit:
                done = prim >= 0
                sp = jnp.where(done, 0, sp)
                next_cur = jnp.where(done, _EMPTY, next_cur)

            need_pop = (next_cur == _EMPTY) & (sp > 0)
            top = sp - 1
            popped = jnp.full(shape, _EMPTY, jnp.int32)
            for s in range(stack_size):
                popped = jnp.where(top == s, stack_ref[s], popped)
            next_cur = jnp.where(need_pop, popped, next_cur)
            sp = jnp.where(need_pop, sp - 1, sp)
            alive = jnp.any(next_cur != _EMPTY).astype(jnp.int32)
            return (alive, next_cur, sp, t_best, prim, u_b, v_b, bf_b)

        state = jax.lax.while_loop(
            lambda s: s[0] > 0, body,
            (jnp.int32(1), cur0, sp0, t_best, prim, u_b, v_b, bf_b),
        )
        return state[3], state[4], state[5], state[6], state[7]

    # ---- outer rounds ----
    def round_body(state):
        _, f_t, f_sid, t_best, prim, u_b, v_b, bf_b = state
        want = active if not any_hit else (active & (prim < 0))
        nt, ns = next_subtree(f_t, f_sid, t_best, want)
        pending = ns >= 0
        sid = jnp.min(jnp.where(pending, ns, 0x7FFFFFFF))

        @pl.when(sid != 0x7FFFFFFF)
        def _():
            cf = pltpu.make_async_copy(
                slab_f_hbm.at[pl.ds(sid * CF, CF), :], slabf, sem.at[0])
            ci_ = pltpu.make_async_copy(
                slab_i_hbm.at[pl.ds(sid * CI, CI), :], slabi, sem.at[1])
            cf.start()
            ci_.start()
            cf.wait()
            ci_.wait()

        participate = pending & (ns == sid)
        t_best, prim, u_b, v_b, bf_b = walk_slab(
            participate & (sid != 0x7FFFFFFF),
            t_best, prim, u_b, v_b, bf_b,
        )
        f_t = jnp.where(participate, nt, f_t)
        f_sid = jnp.where(participate, sid, f_sid)
        alive = (sid != 0x7FFFFFFF).astype(jnp.int32)
        return (alive, f_t, f_sid, t_best, prim, u_b, v_b, bf_b)

    state0 = (
        jnp.int32(1),
        jnp.full(shape, -BIG, jnp.float32),      # frontier t
        jnp.full(shape, -1, jnp.int32),          # frontier sid
        t_limit, jnp.full(shape, -1, jnp.int32),
        jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.int32),
    )
    state = jax.lax.while_loop(lambda s: s[0] > 0, round_body, state0)
    _, _, _, t_best, prim, u_b, v_b, bf_b = state
    o_t[:] = t_best
    o_prim[:] = prim
    o_u[:] = u_b
    o_v[:] = v_b
    o_bf[:] = bf_b


@functools.partial(
    jax.jit,
    static_argnames=("S", "block_rows", "stack_size", "max_leaf", "any_hit",
                     "interpret"),
)
def _trace_binned_call(slab_f, slab_i, aabb8, ro, rd, t_min, t_max,
                       active, *, S, block_rows, stack_size, max_leaf,
                       any_hit, interpret=False):
    B = block_rows
    R = ro.shape[0]
    rows = _ceil_to(R, B * LANES) // LANES
    grid = rows // B

    def prep(x, fill):
        flat = jnp.full((rows * LANES,), fill, x.dtype).at[:R].set(x)
        return flat.reshape(rows, LANES)

    args = [
        prep(ro[:, 0], 0.0), prep(ro[:, 1], 0.0), prep(ro[:, 2], 0.0),
        prep(rd[:, 0], 1.0), prep(rd[:, 1], 0.0), prep(rd[:, 2], 0.0),
        prep(t_min, 0.0), prep(t_max, 0.0),
        prep(active.astype(jnp.int32), 0),
    ]
    ray_spec = pl.BlockSpec((B, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
    ]

    def kern(*refs):
        _binned_kernel(refs, B=B, S=S, stack_size=stack_size,
                       max_leaf=max_leaf, any_hit=any_hit)

    t, prim, u, v, bf = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # slab_f (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),   # slab_i (HBM)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # aabb8 (8, S_pad)
        ] + [ray_spec] * 9,
        out_specs=[ray_spec] * 5,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((CF, LANES), jnp.float32),
            pltpu.VMEM((CI, LANES), jnp.int32),
            pltpu.VMEM((stack_size, B, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(slab_f, slab_i, aabb8, *args)

    def unprep(x):
        return x.reshape(-1)[:R]

    return tuple(unprep(x) for x in (t, prim, u, v, bf))


def trace_flat_binned(binned, ro, rd, t_min, t_max, active, *,
                      max_leaf, any_hit=False, block_rows=32,
                      sort_rays=True, interpret=False):
    """Big flattened scenes: per-block subtree DMA traversal (see section
    comment).  ``binned``: the dict from :func:`pack_binned_scene` (numpy
    or traced device arrays — static ints are shape-derived).  Rays are
    pre-sorted by their nearest subtree so blocks stay coherent; hits
    scatter back, so the result order is unchanged."""
    sg = jax.lax.stop_gradient
    ro, rd, t_min, t_max = sg(ro), sg(rd), sg(t_min), sg(t_max)
    S = binned["slab_i"].shape[0] // CI
    stack_size = binned["stack_arr"].shape[0]
    S_pad = _ceil_to(max(S, LANES), LANES)
    sub_lo = jnp.asarray(binned["sub_lo"])
    sub_hi = jnp.asarray(binned["sub_hi"])
    aabb8 = jnp.zeros((8, S_pad), jnp.float32)
    aabb8 = aabb8.at[0:3, :S].set(sub_lo.T)
    aabb8 = aabb8.at[3:6, :S].set(sub_hi.T)
    # padded slots: inverted boxes never hit
    aabb8 = aabb8.at[0:3, S:].set(1.0)
    aabb8 = aabb8.at[3:6, S:].set(0.0)

    perm = None
    if sort_rays:
        # first-subtree key per ray: brute AABB sweep, no gathers (slices
        # of the (S, 3) bounds arrays)
        inv = 1.0 / jnp.where(jnp.abs(rd) > 1e-7,
                              rd, jnp.where(rd >= 0, 1e-7, -1e-7))
        best_t = jnp.full(ro.shape[:1], 3.4e38, jnp.float32)
        best_s = jnp.full(ro.shape[:1], S, jnp.int32)
        for s in range(S):
            t0 = (sub_lo[s] - ro) * inv
            t1 = (sub_hi[s] - ro) * inv
            tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), t_min)
            tf = jnp.minimum(jnp.max(jnp.maximum(t0, t1), axis=-1) * 1.00000024,
                             t_max)
            hit = (tn <= tf) & active
            take = hit & (tn < best_t)
            best_t = jnp.where(take, tn, best_t)
            best_s = jnp.where(take, jnp.int32(s), best_s)
        perm = jnp.argsort(best_s, stable=True)
        ro, rd = ro[perm], rd[perm]
        t_min, t_max, active = t_min[perm], t_max[perm], active[perm]

    out = _trace_binned_call(
        jnp.asarray(binned["slab_f"]), jnp.asarray(binned["slab_i"]),
        aabb8, ro, rd, t_min, t_max, active,
        S=S, block_rows=block_rows,
        stack_size=stack_size, max_leaf=max_leaf,
        any_hit=any_hit, interpret=interpret,
    )
    if perm is not None:
        inv_perm = jnp.argsort(perm)
        out = tuple(x[inv_perm] for x in out)
    t, prim, u, v, bf = out
    return Hit(t=t, prim=prim, u=u, v=v, backface=bf != 0)
