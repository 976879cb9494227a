"""Wavefront BVH traversal, vectorized over the whole ray population.

This replaces the reference's per-ray recursive-stack traversal
(internal/CoreRef.cpp:1890-2740 ``Traverse_TLAS/BLAS_WithStack_*``) with a
TPU-native formulation: *all* rays advance one traversal step per iteration
of a single ``lax.while_loop``, each holding a private stack in a fixed
``[STACK, R]`` array.  A step pops one stack entry; internal entries test the
two child AABBs stored in the parent slot (pure VPU math on gathered node
columns) and push the hit children near-first, leaf entries intersect their
``≤ max_leaf`` triangles as one fixed-size vectorized block.  Divergence
costs idle lanes rather than scalar branches — the standard trade on a
vector machine.

Layout discipline (the thing that makes this fast on TPU): every per-ray
quantity in the loop is a 1-D ``(R,)`` array and the stack is ``(S, R)`` —
R rides the 128-lane axis with zero padding.  ``(R, 3)`` vectors inside the
loop would tile as (8, 128) with the 3 padded to 128: a 42× HBM blowup
measured at 1080p wavefronts.  Scene-side node/triangle data comes in as the
1-D column dicts built by ``scene.bvh.pack_bvh_soa``/``pack_tri_soa``.

Gradients: traversal is a pure *discrete* decision procedure; we return
indices/barycentrics with integer types or through ``stop_gradient`` and let
shading re-derive differentiable hit attributes from the scene arrays
("detached sampling, attached evaluation").
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ray_tpu.scene.bvh import LEAF_COUNT_BITS, LEAF_COUNT_MASK, MAX_STACK_SIZE


class Hit(NamedTuple):
    """Closest-hit record (SoA over rays), analogue of ``hit_data_t``
    (reference internal/CoreRef.h:89)."""

    t: jnp.ndarray          # f32, distance (t_max if miss)
    prim: jnp.ndarray       # i32, triangle index in leaf order (-1 = miss)
    u: jnp.ndarray          # f32 barycentric of vertex 1
    v: jnp.ndarray          # f32 barycentric of vertex 2
    backface: jnp.ndarray   # bool


class HitInst(NamedTuple):
    """Two-level hit record: Hit plus the instance index (the reference's
    ``hit_data_t.obj_index``, internal/CoreRef.h:89)."""

    t: jnp.ndarray
    prim: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    backface: jnp.ndarray
    inst: jnp.ndarray       # i32 instance index (-1 = miss)


def _decode_leaf(code):
    v = -code - 1
    return v >> LEAF_COUNT_BITS, v & LEAF_COUNT_MASK


def _safe_inv(v):
    tiny = jnp.where(v >= 0.0, jnp.float32(1e-7), jnp.float32(-1e-7))
    return 1.0 / jnp.where(jnp.abs(v) > 1e-7, v, tiny)


def _aabb_c(ox, oy, oz, ix, iy, iz, lox, loy, loz, hix, hiy, hiz, t_min, t_max):
    """Slab test, all-1-D. Returns (hit, t_near)."""
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
        jnp.minimum(jnp.maximum(tz0, tz1), t_max),
    )
    return tn <= tf * 1.00000024, tn


def _tri_c(ox, oy, oz, dx, dy, dz, p0x, p0y, p0z, p1x, p1y, p1z,
           p2x, p2y, p2z, t_min, t_max):
    """Möller–Trumbore, all-1-D. Returns (hit, t, u, v, backface)."""
    e1x, e1y, e1z = p1x - p0x, p1y - p0y, p1z - p0z
    e2x, e2y, e2z = p2x - p0x, p2y - p0y, p2z - p0z
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    valid_det = det != 0.0  # scale-invariant (see ops/intersect.py HIT_EPS note)
    inv_det = 1.0 / jnp.where(valid_det, det, 1.0)
    tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    hit = (
        valid_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min) & (t < t_max)
    )
    return hit, t, u, v, det < 0.0


_EMPTY = jnp.int32(-0x80000000)  # stack-empty sentinel (never a valid code)


def _traverse(bvh, tris, ro, rd, t_min, t_max, active, max_leaf, stack_size,
              any_hit, tri_vis=None, ray_mask=None):
    """Register-cached traversal: the current entry lives in ``cur`` and the
    stack only holds deferred far children.  Pushes/pops use one-hot
    select/reduce over the small S axis instead of scatter/gather — scatters
    into a (S, R) buffer were the dominant cost of the first implementation
    (TPU lowers them poorly), while S·R elementwise selects are cheap VPU
    work.  Each iteration retires one node *or* one leaf per ray and folds
    the following pop into the same step."""
    R = ro.shape[0]
    ox, oy, oz = ro[:, 0], ro[:, 1], ro[:, 2]
    dx, dy, dz = rd[:, 0], rd[:, 1], rd[:, 2]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)

    s_iota = jnp.arange(stack_size, dtype=jnp.int32)[:, None]  # (S, 1)

    stack0 = jnp.full((stack_size, R), _EMPTY, jnp.int32)
    sp0 = jnp.zeros((R,), jnp.int32)
    cur0 = jnp.where(active, 0, _EMPTY)  # root = slot code 0

    hit0 = Hit(
        t=jnp.asarray(t_max, jnp.float32),
        prim=jnp.full((R,), -1, jnp.int32),
        u=jnp.zeros((R,), jnp.float32),
        v=jnp.zeros((R,), jnp.float32),
        backface=jnp.zeros((R,), jnp.bool_),
    )

    def cond(state):
        _, _, cur, _ = state
        return jnp.any(cur != _EMPTY)

    def body(state):
        stack, sp, cur, hit = state
        is_node = cur >= 0
        is_leaf = (cur < 0) & (cur != _EMPTY)
        node = jnp.where(is_node, cur, 0)

        # ---- internal: test both children — one packed-row gather,
        # transposed so each field is a contiguous (R,) row (column slices
        # of the 128-lane-padded gather output relayout per column) ----
        nrow = bvh["packed"][node].T  # (14, R)
        h0, t0 = _aabb_c(
            ox, oy, oz, ix, iy, iz,
            nrow[0], nrow[1], nrow[2], nrow[3], nrow[4], nrow[5],
            t_min, hit.t,
        )
        h1, t1 = _aabb_c(
            ox, oy, oz, ix, iy, iz,
            nrow[6], nrow[7], nrow[8], nrow[9], nrow[10], nrow[11],
            t_min, hit.t,
        )
        c0 = jax.lax.bitcast_convert_type(nrow[12], jnp.int32)
        c1 = jax.lax.bitcast_convert_type(nrow[13], jnp.int32)
        near_is_0 = t0 <= t1
        near_code = jnp.where(near_is_0, c0, c1)
        far_code = jnp.where(near_is_0, c1, c0)
        near_hit = jnp.where(near_is_0, h0, h1) & is_node
        far_hit = jnp.where(near_is_0, h1, h0) & is_node

        # descend near; defer far on the stack only when both children hit
        push = near_hit & far_hit
        stack = jnp.where((s_iota == sp[None, :]) & push[None, :],
                          far_code[None, :], stack)
        sp = sp + push.astype(jnp.int32)
        from_node = jnp.where(
            near_hit, near_code, jnp.where(far_hit, far_code, _EMPTY)
        )

        # ---- leaf: fixed-size vectorized block of triangle tests ----
        first, count = _decode_leaf(jnp.where(is_leaf, cur, -1))
        t_best, prim_best, u_best, v_best, bf_best = (
            hit.t, hit.prim, hit.u, hit.v, hit.backface,
        )
        for k in range(max_leaf):
            valid = is_leaf & (k < count)
            tri = jnp.where(valid, first + k, 0)
            if tri_vis is not None:
                # per-ray-type visibility (reference mesh_instance_t
                # ray_visibility test, internal/CoreRef.cpp:1890+)
                valid = valid & ((tri_vis[tri] & ray_mask) != 0)
            trow = tris["packed"][tri].T  # (9, R) — one gather per slot
            th, tt, tu, tv, tb = _tri_c(
                ox, oy, oz, dx, dy, dz,
                trow[0], trow[1], trow[2], trow[3], trow[4], trow[5],
                trow[6], trow[7], trow[8],
                t_min, t_max if any_hit else t_best,
            )
            take = th & valid
            t_best = jnp.where(take, tt, t_best)
            prim_best = jnp.where(take, tri, prim_best)
            u_best = jnp.where(take, tu, u_best)
            v_best = jnp.where(take, tv, v_best)
            bf_best = jnp.where(take, tb, bf_best)

        next_cur = jnp.where(is_node, from_node, _EMPTY)
        if any_hit:
            done = prim_best >= 0
            sp = jnp.where(done, 0, sp)
            next_cur = jnp.where(done, _EMPTY, next_cur)

        # pop where exhausted: one-hot reduce over the S axis
        need_pop = (next_cur == _EMPTY) & (sp > 0)
        top = sp - 1
        popped = jnp.max(
            jnp.where(s_iota == top[None, :], stack, _EMPTY), axis=0
        )
        next_cur = jnp.where(need_pop, popped, next_cur)
        sp = jnp.where(need_pop, sp - 1, sp)

        new_hit = Hit(t=t_best, prim=prim_best, u=u_best, v=v_best,
                      backface=bf_best)
        return stack, sp, next_cur, new_hit

    _, _, _, hit = jax.lax.while_loop(cond, body, (stack0, sp0, cur0, hit0))
    return hit


def _traverse_wide(wn, ro, rd, t_min, t_max, active, max_leaf, stack_size,
                   any_hit, has_vis=False, ray_mask=None):
    """8-wide wavefront traversal over the wbvh (scene/wbvh.py) — the TPU
    analogue of the reference's wbvh path (Traverse_TLAS_WithStack over
    wbvh_node_t, CoreRef.cpp:2027).  Nodes and padded leaf groups live in
    ONE row table, so every step is exactly one row gather — the gathered
    row is interpreted as 8 child AABBs or as ≤ max_leaf inlined triangles
    by the visit code (two separate tables cost two full gathers per step,
    one of them always wasted).  The stack holds ``node<<8|mask`` resume
    codes — a pop re-enters the node-visit branch with the
    remaining-children mask, so multi-hit nodes never need a second stack
    slot."""
    R = ro.shape[0]
    ox, oy, oz = ro[:, 0], ro[:, 1], ro[:, 2]
    dx, dy, dz = rd[:, 0], rd[:, 1], rd[:, 2]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    rows = wn["wrows"]

    s_iota = jnp.arange(stack_size, dtype=jnp.int32)[:, None]
    stack0 = jnp.full((stack_size, R), _EMPTY, jnp.int32)
    sp0 = jnp.zeros((R,), jnp.int32)
    cur0 = jnp.where(active, jnp.int32(0xFF), _EMPTY)  # root<<8 | full mask

    hit0 = Hit(
        t=jnp.asarray(t_max, jnp.float32),
        prim=jnp.full((R,), -1, jnp.int32),
        u=jnp.zeros((R,), jnp.float32),
        v=jnp.zeros((R,), jnp.float32),
        backface=jnp.zeros((R,), jnp.bool_),
    )

    def cond(state):
        return jnp.any(state[2] != _EMPTY)

    def body(state):
        stack, sp, cur, hit = state
        is_node = cur >= 0
        is_leaf = (cur < 0) & (cur != _EMPTY)
        node = jnp.where(is_node, cur >> 8, 0)
        mask = jnp.where(is_node, cur & 0xFF, 0)

        # ---- THE gather: one unified row per lane per step ----
        ridx = jnp.where(is_node, node, jnp.where(is_leaf, -cur - 1, 0))
        row = rows[ridx].T              # (W, R)

        # ---- wide-node interpretation: the whole 8-child slab test as ONE
        # pass of (8, R) tile math (child-SoA layout, scene/wbvh.py) ----
        lox, loy, loz = row[0:8], row[8:16], row[16:24]
        hix, hiy, hiz = row[24:32], row[32:40], row[40:48]
        codes8 = jax.lax.bitcast_convert_type(row[48:56], jnp.int32)

        i8 = jnp.arange(8, dtype=jnp.int32)[:, None]           # (8, 1)
        in_mask = ((mask[None, :] >> i8) & 1) != 0             # (8, R)
        h8, t8 = _aabb_c(
            ox[None, :], oy[None, :], oz[None, :],
            ix[None, :], iy[None, :], iz[None, :],
            lox, loy, loz, hix, hiy, hiz,
            t_min[None, :], hit.t[None, :],
        )
        ok8 = h8 & in_mask & (codes8 != _EMPTY) & is_node[None, :]
        t8m = jnp.where(ok8, t8, jnp.inf)
        best_i = jnp.argmin(t8m, axis=0).astype(jnp.int32)     # (R,)
        hit_any = jnp.any(ok8, axis=0)
        onehot = i8 == best_i[None, :]
        best_code = jnp.sum(jnp.where(onehot, codes8, 0), axis=0)
        rem = jnp.sum(
            jnp.where(ok8 & (~onehot), jnp.int32(1) << i8, 0), axis=0
        )

        # push a resume code if other children remain
        push = is_node & hit_any & (rem != 0)
        resume = (node << 8) | rem
        stack = jnp.where((s_iota == sp[None, :]) & push[None, :],
                          resume[None, :], stack)
        sp = sp + push.astype(jnp.int32)
        from_node = jnp.where(is_node & hit_any, best_code, _EMPTY)

        # ---- leaf interpretation: all max_leaf triangles as one
        # (max_leaf, R) Möller-Trumbore pass (slot-SoA layout) ----
        L = max_leaf
        th, tt, tu, tv, tb = _tri_c(
            ox[None, :], oy[None, :], oz[None, :],
            dx[None, :], dy[None, :], dz[None, :],
            row[0:L], row[L:2 * L], row[2 * L:3 * L],
            row[3 * L:4 * L], row[4 * L:5 * L], row[5 * L:6 * L],
            row[6 * L:7 * L], row[7 * L:8 * L], row[8 * L:9 * L],
            t_min[None, :], (t_max if any_hit else hit.t)[None, :],
        )
        prim4 = jax.lax.bitcast_convert_type(row[9 * L:10 * L], jnp.int32)
        valid4 = is_leaf[None, :] & (prim4 >= 0)
        if has_vis:
            vis4 = jax.lax.bitcast_convert_type(
                row[10 * L:11 * L], jnp.int32
            )
            valid4 = valid4 & ((vis4 & ray_mask[None, :]) != 0)
        hit4 = th & valid4
        tt4 = jnp.where(hit4, tt, jnp.inf)
        k_best = jnp.argmin(tt4, axis=0).astype(jnp.int32)
        koh = jnp.arange(L, dtype=jnp.int32)[:, None] == k_best[None, :]

        def pick(a, fill):
            return jnp.sum(jnp.where(koh, a, fill), axis=0)

        any4 = jnp.any(hit4, axis=0)
        lt = pick(tt4, 0.0)
        take = any4 & (lt < hit.t)
        t_best = jnp.where(take, lt, hit.t)
        prim_best = jnp.where(take, pick(prim4, 0), hit.prim)
        u_best = jnp.where(take, pick(tu, 0.0), hit.u)
        v_best = jnp.where(take, pick(tv, 0.0), hit.v)
        bf_best = jnp.where(take, jnp.any(koh & tb, axis=0), hit.backface)

        next_cur = from_node
        if any_hit:
            done = prim_best >= 0
            sp = jnp.where(done, 0, sp)
            next_cur = jnp.where(done, _EMPTY, next_cur)

        need_pop = (next_cur == _EMPTY) & (sp > 0)
        top = sp - 1
        popped = jnp.max(
            jnp.where(s_iota == top[None, :], stack, _EMPTY), axis=0
        )
        next_cur = jnp.where(need_pop, popped, next_cur)
        sp = jnp.where(need_pop, sp - 1, sp)

        new_hit = Hit(t=t_best, prim=prim_best, u=u_best, v=v_best,
                      backface=bf_best)
        return stack, sp, next_cur, new_hit

    _, _, _, hit = jax.lax.while_loop(cond, body, (stack0, sp0, cur0, hit0))
    return hit


def _traverse_wide_tlas(wn, ro, rd, t_min, t_max, active, ray_mask,
                        max_leaf, stack_size, any_hit):
    """Wide two-level TLAS/BLAS traversal over the unified row table built
    by scene/wbvh.py ``build_wtlas``.  Same single-gather-per-step design
    as :func:`_traverse_wide`; additionally a TLAS leaf is an *instance
    row* carrying the object-from-world transform, per-ray-type visibility
    and the mesh's BLAS root code.  Entering an instance pushes a RESTORE
    marker and rewrites the lane's current-space ray; LIFO order guarantees
    the marker pops after the BLAS finishes.  Object-space directions stay
    unnormalized so t is world-metric in both spaces (same invariant as the
    binary ``_traverse_tlas``)."""
    from ray_tpu.scene.wbvh import INST_ROW_BIT

    R = ro.shape[0]
    wox, woy, woz = ro[:, 0], ro[:, 1], ro[:, 2]
    wdx, wdy, wdz = rd[:, 0], rd[:, 1], rd[:, 2]
    wix, wiy, wiz = _safe_inv(wdx), _safe_inv(wdy), _safe_inv(wdz)
    if ray_mask is None:
        ray_mask = jnp.full((R,), 0x7fffffff, jnp.int32)
    rows = wn["wrows_tlas"]

    s_iota = jnp.arange(stack_size, dtype=jnp.int32)[:, None]
    stack0 = jnp.full((stack_size, R), _EMPTY, jnp.int32)
    sp0 = jnp.zeros((R,), jnp.int32)
    cur0 = jnp.where(active, jnp.int32(0xFF), _EMPTY)  # TLAS root, full mask

    hit0 = HitInst(
        t=jnp.asarray(t_max, jnp.float32),
        prim=jnp.full((R,), -1, jnp.int32),
        u=jnp.zeros((R,), jnp.float32),
        v=jnp.zeros((R,), jnp.float32),
        backface=jnp.zeros((R,), jnp.bool_),
        inst=jnp.full((R,), -1, jnp.int32),
    )

    def cond(state):
        return jnp.any(state[2] != _EMPTY)

    def body(state):
        (stack, sp, cur, cur_inst,
         ox, oy, oz, dx, dy, dz, ix, iy, iz, hit) = state
        is_node = cur >= 0
        neg = (cur < 0) & (cur != _EMPTY) & (cur != _RESTORE)
        is_restore = cur == _RESTORE
        v = jnp.where(neg, -cur - 1, 0)
        is_inst = neg & ((v & INST_ROW_BIT) != 0)
        is_tri = neg & (~is_inst)
        node = jnp.where(is_node, cur >> 8, 0)
        mask = jnp.where(is_node, cur & 0xFF, 0)

        # ---- THE gather: one unified row per lane per step ----
        ridx = jnp.where(is_node, node, v & (INST_ROW_BIT - 1))
        row = rows[ridx].T              # (W, R)

        # ---- wide-node interpretation (current-space ray) ----
        lox, loy, loz = row[0:8], row[8:16], row[16:24]
        hix, hiy, hiz = row[24:32], row[32:40], row[40:48]
        codes8 = jax.lax.bitcast_convert_type(row[48:56], jnp.int32)
        i8 = jnp.arange(8, dtype=jnp.int32)[:, None]
        in_mask = ((mask[None, :] >> i8) & 1) != 0
        h8, t8 = _aabb_c(
            ox[None, :], oy[None, :], oz[None, :],
            ix[None, :], iy[None, :], iz[None, :],
            lox, loy, loz, hix, hiy, hiz,
            t_min[None, :], hit.t[None, :],
        )
        ok8 = h8 & in_mask & (codes8 != _EMPTY) & is_node[None, :]
        t8m = jnp.where(ok8, t8, jnp.inf)
        best_i = jnp.argmin(t8m, axis=0).astype(jnp.int32)
        hit_any = jnp.any(ok8, axis=0)
        onehot = i8 == best_i[None, :]
        best_code = jnp.sum(jnp.where(onehot, codes8, 0), axis=0)
        rem = jnp.sum(
            jnp.where(ok8 & (~onehot), jnp.int32(1) << i8, 0), axis=0
        )
        resume = (node << 8) | rem
        push_node = is_node & hit_any & (rem != 0)
        from_node = jnp.where(is_node & hit_any, best_code, _EMPTY)

        # ---- instance-row interpretation: visibility + enter BLAS ----
        ivis = jax.lax.bitcast_convert_type(row[12], jnp.int32)
        iroot = jax.lax.bitcast_convert_type(row[13], jnp.int32)
        enter = is_inst & ((ivis & ray_mask) != 0)
        eox = row[0] * wox + row[1] * woy + row[2] * woz + row[9]
        eoy = row[3] * wox + row[4] * woy + row[5] * woz + row[10]
        eoz = row[6] * wox + row[7] * woy + row[8] * woz + row[11]
        edx = row[0] * wdx + row[1] * wdy + row[2] * wdz
        edy = row[3] * wdx + row[4] * wdy + row[5] * wdz
        edz = row[6] * wdx + row[7] * wdy + row[8] * wdz
        ii = v & (INST_ROW_BIT - 1)  # instance ROW index; id fixed below

        # ---- push: node resume or RESTORE marker ----
        push = push_node | enter
        push_val = jnp.where(enter, _RESTORE, resume)
        stack = jnp.where((s_iota == sp[None, :]) & push[None, :],
                          push_val[None, :], stack)
        sp = sp + push.astype(jnp.int32)

        # ---- current-space ray update (enter → object, restore → world) --
        ox = jnp.where(enter, eox, jnp.where(is_restore, wox, ox))
        oy = jnp.where(enter, eoy, jnp.where(is_restore, woy, oy))
        oz = jnp.where(enter, eoz, jnp.where(is_restore, woz, oz))
        dx = jnp.where(enter, edx, jnp.where(is_restore, wdx, dx))
        dy = jnp.where(enter, edy, jnp.where(is_restore, wdy, dy))
        dz = jnp.where(enter, edz, jnp.where(is_restore, wdz, dz))
        ix = jnp.where(enter, _safe_inv(edx), jnp.where(is_restore, wix, ix))
        iy = jnp.where(enter, _safe_inv(edy), jnp.where(is_restore, wiy, iy))
        iz = jnp.where(enter, _safe_inv(edz), jnp.where(is_restore, wiz, iz))
        cur_inst = jnp.where(enter, ii, cur_inst)

        # ---- tri-leaf interpretation (object-space ray, world-metric t) --
        L = max_leaf
        th, tt, tu, tv, tb = _tri_c(
            ox[None, :], oy[None, :], oz[None, :],
            dx[None, :], dy[None, :], dz[None, :],
            row[0:L], row[L:2 * L], row[2 * L:3 * L],
            row[3 * L:4 * L], row[4 * L:5 * L], row[5 * L:6 * L],
            row[6 * L:7 * L], row[7 * L:8 * L], row[8 * L:9 * L],
            t_min[None, :], (t_max if any_hit else hit.t)[None, :],
        )
        prim4 = jax.lax.bitcast_convert_type(row[9 * L:10 * L], jnp.int32)
        hit4 = th & is_tri[None, :] & (prim4 >= 0)
        tt4 = jnp.where(hit4, tt, jnp.inf)
        k_best = jnp.argmin(tt4, axis=0).astype(jnp.int32)
        koh = jnp.arange(L, dtype=jnp.int32)[:, None] == k_best[None, :]

        def pick(a, fill):
            return jnp.sum(jnp.where(koh, a, fill), axis=0)

        any4 = jnp.any(hit4, axis=0)
        lt = pick(tt4, 0.0)
        take = any4 & (lt < hit.t)
        t_best = jnp.where(take, lt, hit.t)
        prim_best = jnp.where(take, pick(prim4, 0), hit.prim)
        u_best = jnp.where(take, pick(tu, 0.0), hit.u)
        v_best = jnp.where(take, pick(tv, 0.0), hit.v)
        bf_best = jnp.where(take, jnp.any(koh & tb, axis=0), hit.backface)
        inst_best = jnp.where(take, cur_inst, hit.inst)

        next_cur = jnp.where(
            is_node, from_node, jnp.where(enter, iroot, _EMPTY)
        )
        if any_hit:
            done = prim_best >= 0
            sp = jnp.where(done, 0, sp)
            next_cur = jnp.where(done, _EMPTY, next_cur)

        need_pop = (next_cur == _EMPTY) & (sp > 0)
        top = sp - 1
        popped = jnp.max(
            jnp.where(s_iota == top[None, :], stack, _EMPTY), axis=0
        )
        next_cur = jnp.where(need_pop, popped, next_cur)
        sp = jnp.where(need_pop, sp - 1, sp)

        new_hit = HitInst(t=t_best, prim=prim_best, u=u_best, v=v_best,
                          backface=bf_best, inst=inst_best)
        return (stack, sp, next_cur, cur_inst,
                ox, oy, oz, dx, dy, dz, ix, iy, iz, new_hit)

    state0 = (stack0, sp0, cur0, jnp.zeros((R,), jnp.int32),
              wox, woy, woz, wdx, wdy, wdz, wix, wiy, wiz, hit0)
    state = jax.lax.while_loop(cond, body, state0)
    hit = state[-1]
    # instance ROW index → instance id (rows are [TLAS | inst | meshes],
    # so id = row - inst_base; inst_base rides in as a static-shaped array)
    inst_id = hit.inst - wn["winst_base"]
    return hit._replace(
        inst=jnp.where(hit.prim >= 0, inst_id, -1)
    )


# Pallas fast-path thresholds (see ops/traverse_pallas.py): brute-force all
# triangles below _PALLAS_BRUTE_MAX (cheaper than any tree walk, no gathers);
# VMEM-resident BVH kernel up to T_MAX_BVH nodes/tris; XLA wavefront beyond.
_PALLAS_BRUTE_MAX = 40

# process-global Pallas opt-out: the facade's RendererType.REF (api.py)
# forces the plain-XLA path, which doubles as the "scalar reference"
# backend for parity testing (the role Ref::SIMDPolicy plays in the
# reference, internal/RendererCPU.h:29)
_FORCE_XLA = False


def set_force_xla(value: bool) -> None:
    global _FORCE_XLA
    _FORCE_XLA = bool(value)


def _pallas_mode(n_nodes: int, n_tris: int, force_xla=None,
                 has_binned=False) -> str:
    # per-call override (threaded from PassSettings.force_xla — one REF
    # renderer no longer disables Pallas for every renderer in the process)
    # OR the process-global escape hatch used by tests/profilers
    if force_xla or _FORCE_XLA or jax.default_backend() != "tpu":
        return "xla"
    from ray_tpu.ops import traverse_pallas as tp

    if n_tris <= _PALLAS_BRUTE_MAX:
        return "brute"
    if max(n_nodes, n_tris) <= tp.T_MAX_BVH:
        return "bvh"
    if has_binned:
        # scenes finalized with pallas_binned=True route to the binned
        # kernel (bit-exact; measured slower than the XLA machine on both
        # cloud and city scenes — see traverse_pallas.py section comment)
        return "binned"
    return "xla"


def trace_closest_soa(bvh, tris, ro, rd, t_min, t_max, active,
                      max_leaf: int = 4, stack_size: int = MAX_STACK_SIZE,
                      tri_vis=None, ray_mask=None, force_xla=None):
    """Closest-hit trace against SoA-packed BVH + triangle columns.

    Dispatches to the Pallas VMEM kernels on TPU for scenes that fit
    (ops/traverse_pallas.py — bit-identical results) and to the XLA
    wavefront loop otherwise.

    Args:
      bvh: dict of (N,) columns from ``pack_bvh_soa``.
      tris: dict of (T,) columns from ``pack_tri_soa`` (leaf order).
      ro, rd: (R, 3) f32; t_min, t_max: (R,) f32; active: (R,) bool.
      tri_vis/ray_mask: optional (T,)/(R,) i32 per-ray-type visibility —
        triangles whose mask shares no bit with the ray's are skipped.
    """
    # resolve the Pallas/XLA mode OUTSIDE the jit boundary so the
    # ``set_force_xla`` toggle is re-read on every *eager/top-level* call
    # (an inner-jit cache would pin the mode chosen at first trace; callers
    # that trace inside an enclosing jit still bake the mode into that outer
    # compilation — the renderer threads PassSettings.force_xla for that)
    mode = (
        None if tri_vis is not None
        else _pallas_mode(bvh["code0"].shape[0], tris["p0x"].shape[0],
                          force_xla, has_binned="binned_slab_f" in bvh)
    )
    return _trace_closest_soa_jit(
        bvh, tris, ro, rd, t_min, t_max, active, tri_vis, ray_mask,
        max_leaf=max_leaf, stack_size=stack_size, mode=mode,
    )


@partial(jax.jit, static_argnames=("max_leaf", "stack_size", "mode"))
def _trace_closest_soa_jit(bvh, tris, ro, rd, t_min, t_max, active,
                           tri_vis, ray_mask, *, max_leaf, stack_size, mode):
    wide = "wrows" in bvh
    if tri_vis is not None:
        if wide:
            hit = _traverse_wide(
                bvh, ro, rd, t_min, t_max, active, max_leaf, stack_size,
                any_hit=False, has_vis=True, ray_mask=ray_mask,
            )
        else:
            hit = _traverse(bvh, tris, ro, rd, t_min, t_max, active, max_leaf,
                            stack_size, any_hit=False, tri_vis=tri_vis,
                            ray_mask=ray_mask)
        return Hit(
            t=jax.lax.stop_gradient(hit.t),
            prim=hit.prim,
            u=jax.lax.stop_gradient(hit.u),
            v=jax.lax.stop_gradient(hit.v),
            backface=hit.backface,
        )
    if mode == "brute":
        from ray_tpu.ops.traverse_pallas import trace_brute_pallas

        hit = trace_brute_pallas(tris, ro, rd, t_min, t_max, active,
                                 n_tris=tris["p0x"].shape[0])
    elif mode == "bvh":
        from ray_tpu.ops.traverse_pallas import trace_bvh_pallas

        hit = trace_bvh_pallas(bvh, tris, ro, rd, t_min, t_max, active,
                               max_leaf=max_leaf, stack_size=stack_size)
    elif mode == "binned":
        from ray_tpu.ops.traverse_pallas import trace_flat_binned

        binned = {k[7:]: v for k, v in bvh.items()
                  if k.startswith("binned_")}
        hit = trace_flat_binned(binned, ro, rd, t_min, t_max, active,
                                max_leaf=max_leaf)
    elif wide:
        hit = _traverse_wide(
            bvh, ro, rd, t_min, t_max, active, max_leaf, stack_size,
            any_hit=False,
        )
    else:
        hit = _traverse(bvh, tris, ro, rd, t_min, t_max, active, max_leaf,
                        stack_size, any_hit=False)
    return Hit(
        t=jax.lax.stop_gradient(hit.t),
        prim=hit.prim,
        u=jax.lax.stop_gradient(hit.u),
        v=jax.lax.stop_gradient(hit.v),
        backface=hit.backface,
    )


def trace_occlusion_soa(bvh, tris, ro, rd, t_min, t_max, active,
                        max_leaf: int = 4, stack_size: int = MAX_STACK_SIZE,
                        tri_vis=None, ray_mask=None, force_xla=None):
    """Any-hit (shadow) trace: returns (R,) bool ``occluded``.

    Early-out per ray mirroring the reference's AnyHit traversal
    (internal/CoreRef.cpp:2135).  Alpha-tested/transparent occluders are
    handled a level up (shade stage); this kernel treats triangles as solid.
    """
    mode = (
        None if tri_vis is not None
        else _pallas_mode(bvh["code0"].shape[0], tris["p0x"].shape[0],
                          force_xla, has_binned="binned_slab_f" in bvh)
    )
    return _trace_occlusion_soa_jit(
        bvh, tris, ro, rd, t_min, t_max, active, tri_vis, ray_mask,
        max_leaf=max_leaf, stack_size=stack_size, mode=mode,
    )


@partial(jax.jit, static_argnames=("max_leaf", "stack_size", "mode"))
def _trace_occlusion_soa_jit(bvh, tris, ro, rd, t_min, t_max, active,
                             tri_vis, ray_mask, *, max_leaf, stack_size, mode):
    wide = "wrows" in bvh
    if tri_vis is not None:
        if wide:
            hit = _traverse_wide(
                bvh, ro, rd, t_min, t_max, active, max_leaf, stack_size,
                any_hit=True, has_vis=True, ray_mask=ray_mask,
            )
        else:
            hit = _traverse(bvh, tris, ro, rd, t_min, t_max, active, max_leaf,
                            stack_size, any_hit=True, tri_vis=tri_vis,
                            ray_mask=ray_mask)
        return hit.prim >= 0
    if mode == "brute":
        from ray_tpu.ops.traverse_pallas import trace_brute_pallas

        hit = trace_brute_pallas(tris, ro, rd, t_min, t_max, active,
                                 n_tris=tris["p0x"].shape[0], any_hit=True)
        return hit.prim >= 0
    if mode == "bvh":
        from ray_tpu.ops.traverse_pallas import trace_bvh_pallas

        hit = trace_bvh_pallas(bvh, tris, ro, rd, t_min, t_max, active,
                               max_leaf=max_leaf, stack_size=stack_size,
                               any_hit=True)
        return hit.prim >= 0
    if mode == "binned":
        from ray_tpu.ops.traverse_pallas import trace_flat_binned

        binned = {k[7:]: v for k, v in bvh.items()
                  if k.startswith("binned_")}
        hit = trace_flat_binned(binned, ro, rd, t_min, t_max, active,
                                max_leaf=max_leaf, any_hit=True)
        return hit.prim >= 0
    if wide:
        hit = _traverse_wide(
            bvh, ro, rd, t_min, t_max, active, max_leaf, stack_size,
            any_hit=True,
        )
        return hit.prim >= 0
    hit = _traverse(bvh, tris, ro, rd, t_min, t_max, active, max_leaf,
                    stack_size, any_hit=True)
    return hit.prim >= 0


# --------------------------------------------------------------------------
# Convenience wrappers over (vertices, tri_vidx) inputs — used by tests.
# --------------------------------------------------------------------------

def _soa_from_arrays(nodes_child_lo, nodes_child_hi, nodes_child,
                     prim_indices, vertices, tri_vidx):
    bvh = {}
    for side in range(2):
        for axis, ax in enumerate("xyz"):
            bvh[f"lo{side}{ax}"] = nodes_child_lo[:, side, axis]
            bvh[f"hi{side}{ax}"] = nodes_child_hi[:, side, axis]
        bvh[f"code{side}"] = nodes_child[:, side]
    bvh["packed"] = jnp.concatenate([
        nodes_child_lo[:, 0], nodes_child_hi[:, 0],
        nodes_child_lo[:, 1], nodes_child_hi[:, 1],
        jax.lax.bitcast_convert_type(
            nodes_child.astype(jnp.int32), jnp.float32
        ),
    ], axis=1)
    tris_leaf = vertices[tri_vidx[prim_indices]]  # (T, 3, 3) leaf order
    tris = {}
    for v in range(3):
        for axis, ax in enumerate("xyz"):
            tris[f"p{v}{ax}"] = tris_leaf[:, v, axis]
    tris["packed"] = tris_leaf.reshape(tris_leaf.shape[0], 9)
    return bvh, tris


def trace_closest(nodes_child_lo, nodes_child_hi, nodes_child, prim_indices,
                  vertices, tri_vidx, ro, rd, t_min, t_max, active,
                  max_leaf: int = 4, stack_size: int = MAX_STACK_SIZE):
    """Array-of-structs wrapper; hit.prim is in *leaf order* — callers using
    original triangle ids should map through ``prim_indices``."""
    bvh, tris = _soa_from_arrays(
        nodes_child_lo, nodes_child_hi, nodes_child, prim_indices,
        vertices, tri_vidx,
    )
    hit = trace_closest_soa(bvh, tris, ro, rd, t_min, t_max, active,
                            max_leaf=max_leaf, stack_size=stack_size)
    orig = prim_indices[jnp.maximum(hit.prim, 0)]
    return hit._replace(prim=jnp.where(hit.prim >= 0, orig, -1))


def trace_occlusion(nodes_child_lo, nodes_child_hi, nodes_child, prim_indices,
                    vertices, tri_vidx, ro, rd, t_min, t_max, active,
                    max_leaf: int = 4, stack_size: int = MAX_STACK_SIZE):
    bvh, tris = _soa_from_arrays(
        nodes_child_lo, nodes_child_hi, nodes_child, prim_indices,
        vertices, tri_vidx,
    )
    return trace_occlusion_soa(bvh, tris, ro, rd, t_min, t_max, active,
                               max_leaf=max_leaf, stack_size=stack_size)


def trace_closest_brute(vertices, tri_vidx, ro, rd, t_min, t_max, active):
    """O(R·T) reference intersector for tests — the executable spec the BVH
    traversal must match exactly (same role as the reference's scalar Ref
    backend vs its SIMD/GPU backends, SURVEY.md §4)."""
    from ray_tpu.ops.intersect import intersect_tri

    p0 = vertices[tri_vidx[:, 0]]
    p1 = vertices[tri_vidx[:, 1]]
    p2 = vertices[tri_vidx[:, 2]]
    hit, t, u, v, bf = intersect_tri(
        ro[:, None, :], rd[:, None, :], p0[None], p1[None], p2[None],
        t_min[:, None], t_max[:, None],
    )
    hit = hit & active[:, None]
    t = jnp.where(hit, t, jnp.inf)
    best = jnp.argmin(t, axis=1)
    r = jnp.arange(ro.shape[0])
    has = hit[r, best]
    return Hit(
        t=jnp.where(has, t[r, best], t_max),
        prim=jnp.where(has, best.astype(jnp.int32), -1),
        u=jnp.where(has, u[r, best], 0.0),
        v=jnp.where(has, v[r, best], 0.0),
        backface=jnp.where(has, bf[r, best], False),
    )


# --------------------------------------------------------------------------
# Two-level TLAS/BLAS traversal with per-instance transforms.
#
# TPU re-design of the reference's Traverse_TLAS_WithStack_* →
# Traverse_BLAS_* nesting (internal/CoreRef.cpp:1890-2740): instead of a
# nested loop, one unified wavefront step machine walks a single code space.
# Node columns hold the TLAS first, then every BLAS (child codes
# pre-offset); TLAS leaves encode instance indices (INST_LEAF_FLAG).  When a
# lane enters an instance it (a) checks the instance's per-ray-type
# visibility mask, (b) pushes a RESTORE marker, (c) transforms its ray into
# object space with the instance's inverse transform and jumps to the BLAS
# root.  LIFO order guarantees every BLAS entry pops before the marker, so
# popping the marker restores the world-space ray.  Object-space directions
# are NOT normalized, which keeps the ray parameter t identical in both
# spaces (hit.t is world-metric even under non-uniform instance scale).
# --------------------------------------------------------------------------

INST_LEAF_FLAG = 1 << 28  # TLAS leaf marker inside the shared code space
_RESTORE = jnp.int32(-0x7ffffffe)  # pop → restore world-space ray


def _xform_dir(inst, ii, x, y, z):
    """Apply the 3×3 part of the per-instance inverse transform."""
    ox = inst["inv00"][ii] * x + inst["inv01"][ii] * y + inst["inv02"][ii] * z
    oy = inst["inv10"][ii] * x + inst["inv11"][ii] * y + inst["inv12"][ii] * z
    oz = inst["inv20"][ii] * x + inst["inv21"][ii] * y + inst["inv22"][ii] * z
    return ox, oy, oz


def _traverse_tlas(nodes, tris, inst, ro, rd, t_min, t_max, active, ray_mask,
                   max_leaf, stack_size, any_hit):
    R = ro.shape[0]
    wox, woy, woz = ro[:, 0], ro[:, 1], ro[:, 2]
    wdx, wdy, wdz = rd[:, 0], rd[:, 1], rd[:, 2]
    wix, wiy, wiz = _safe_inv(wdx), _safe_inv(wdy), _safe_inv(wdz)
    if ray_mask is None:
        ray_mask = jnp.full((R,), 0x7fffffff, jnp.int32)

    s_iota = jnp.arange(stack_size, dtype=jnp.int32)[:, None]

    stack0 = jnp.full((stack_size, R), _EMPTY, jnp.int32)
    sp0 = jnp.zeros((R,), jnp.int32)
    cur0 = jnp.where(active, 0, _EMPTY)  # TLAS root is node 0
    inst0 = jnp.zeros((R,), jnp.int32)

    hit0 = HitInst(
        t=jnp.asarray(t_max, jnp.float32),
        prim=jnp.full((R,), -1, jnp.int32),
        u=jnp.zeros((R,), jnp.float32),
        v=jnp.zeros((R,), jnp.float32),
        backface=jnp.zeros((R,), jnp.bool_),
        inst=jnp.full((R,), -1, jnp.int32),
    )

    def cond(state):
        cur = state[2]
        return jnp.any(cur != _EMPTY)

    def body(state):
        (stack, sp, cur, cur_inst,
         ox, oy, oz, dx, dy, dz, ix, iy, iz, hit) = state

        is_node = cur >= 0
        leafish = (cur < 0) & (cur != _EMPTY) & (cur != _RESTORE)
        v = jnp.where(leafish, -cur - 1, 0)
        is_inst = leafish & ((v & INST_LEAF_FLAG) != 0)
        is_tri = leafish & (~is_inst)
        is_restore = cur == _RESTORE
        node = jnp.where(is_node, cur, 0)

        # ---- internal node (TLAS or BLAS — same columns, current-space
        # ray): one packed-row gather, transposed for contiguous rows ----
        nrow = nodes["packed"][node].T  # (14, R)
        h0, t0 = _aabb_c(
            ox, oy, oz, ix, iy, iz,
            nrow[0], nrow[1], nrow[2], nrow[3], nrow[4], nrow[5],
            t_min, hit.t,
        )
        h1, t1 = _aabb_c(
            ox, oy, oz, ix, iy, iz,
            nrow[6], nrow[7], nrow[8], nrow[9], nrow[10], nrow[11],
            t_min, hit.t,
        )
        c0 = jax.lax.bitcast_convert_type(nrow[12], jnp.int32)
        c1 = jax.lax.bitcast_convert_type(nrow[13], jnp.int32)
        near_is_0 = t0 <= t1
        near_code = jnp.where(near_is_0, c0, c1)
        far_code = jnp.where(near_is_0, c1, c0)
        near_hit = jnp.where(near_is_0, h0, h1) & is_node
        far_hit = jnp.where(near_is_0, h1, h0) & is_node
        push_far = near_hit & far_hit
        from_node = jnp.where(
            near_hit, near_code, jnp.where(far_hit, far_code, _EMPTY)
        )

        # ---- instance leaf: visibility test + enter BLAS ----
        ii = jnp.where(is_inst, v & (INST_LEAF_FLAG - 1), 0)
        enter = is_inst & ((inst["vis"][ii] & ray_mask) != 0)
        eox, eoy, eoz = _xform_dir(inst, ii, wox, woy, woz)
        eox = eox + inst["invtx"][ii]
        eoy = eoy + inst["invty"][ii]
        eoz = eoz + inst["invtz"][ii]
        edx, edy, edz = _xform_dir(inst, ii, wdx, wdy, wdz)
        from_inst = jnp.where(enter, inst["blas_root"][ii], _EMPTY)

        # ---- push: far child (internal) or RESTORE marker (enter) ----
        push = push_far | enter
        push_val = jnp.where(enter, _RESTORE, far_code)
        stack = jnp.where((s_iota == sp[None, :]) & push[None, :],
                          push_val[None, :], stack)
        sp = sp + push.astype(jnp.int32)

        # ---- current-space ray update (enter → object, restore → world) --
        ox = jnp.where(enter, eox, jnp.where(is_restore, wox, ox))
        oy = jnp.where(enter, eoy, jnp.where(is_restore, woy, oy))
        oz = jnp.where(enter, eoz, jnp.where(is_restore, woz, oz))
        dx = jnp.where(enter, edx, jnp.where(is_restore, wdx, dx))
        dy = jnp.where(enter, edy, jnp.where(is_restore, wdy, dy))
        dz = jnp.where(enter, edz, jnp.where(is_restore, wdz, dz))
        ix = jnp.where(enter, _safe_inv(edx), jnp.where(is_restore, wix, ix))
        iy = jnp.where(enter, _safe_inv(edy), jnp.where(is_restore, wiy, iy))
        iz = jnp.where(enter, _safe_inv(edz), jnp.where(is_restore, wiz, iz))
        cur_inst = jnp.where(enter, ii, cur_inst)

        # ---- triangle leaf (object-space ray, world-metric t) ----
        first, count = _decode_leaf(jnp.where(is_tri, cur, -1))
        t_best, prim_best, u_best, v_best, bf_best, inst_best = (
            hit.t, hit.prim, hit.u, hit.v, hit.backface, hit.inst,
        )
        for k in range(max_leaf):
            valid = is_tri & (k < count)
            tri = jnp.where(valid, first + k, 0)
            trow = tris["packed"][tri].T  # (9, R) — one gather per slot
            th, tt, tu, tv, tb = _tri_c(
                ox, oy, oz, dx, dy, dz,
                trow[0], trow[1], trow[2], trow[3], trow[4], trow[5],
                trow[6], trow[7], trow[8],
                t_min, t_max if any_hit else t_best,
            )
            take = th & valid
            t_best = jnp.where(take, tt, t_best)
            prim_best = jnp.where(take, tri, prim_best)
            u_best = jnp.where(take, tu, u_best)
            v_best = jnp.where(take, tv, v_best)
            bf_best = jnp.where(take, tb, bf_best)
            inst_best = jnp.where(take, cur_inst, inst_best)

        next_cur = jnp.where(
            is_node, from_node, jnp.where(enter, from_inst, _EMPTY)
        )
        if any_hit:
            done = prim_best >= 0
            sp = jnp.where(done, 0, sp)
            next_cur = jnp.where(done, _EMPTY, next_cur)

        need_pop = (next_cur == _EMPTY) & (sp > 0)
        top = sp - 1
        popped = jnp.max(
            jnp.where(s_iota == top[None, :], stack, _EMPTY), axis=0
        )
        next_cur = jnp.where(need_pop, popped, next_cur)
        sp = jnp.where(need_pop, sp - 1, sp)

        new_hit = HitInst(t=t_best, prim=prim_best, u=u_best, v=v_best,
                          backface=bf_best, inst=inst_best)
        return (stack, sp, next_cur, cur_inst,
                ox, oy, oz, dx, dy, dz, ix, iy, iz, new_hit)

    state0 = (stack0, sp0, cur0, inst0,
              wox, woy, woz, wdx, wdy, wdz, wix, wiy, wiz, hit0)
    state = jax.lax.while_loop(cond, body, state0)
    return state[-1]


def _tlas_pallas_ok(nodes, force_xla) -> bool:
    """Route to the VMEM-resident Pallas TLAS kernel on TPU when the
    unified row table fits the gather budget (traverse_pallas
    T_MAX_TLAS_ROWS) — heavily instanced scenes qualify far beyond the
    flattened-triangle Pallas cap."""
    if force_xla or _FORCE_XLA or jax.default_backend() != "tpu":
        return False
    if "wrows_tlas" not in nodes:
        return False
    from ray_tpu.ops import traverse_pallas as tp

    return nodes["wrows_tlas"].shape[0] <= tp.T_MAX_TLAS_ROWS


@partial(jax.jit, static_argnames=("max_leaf", "stack_size", "force_xla"))
def trace_closest_tlas(nodes, tris, inst, ro, rd, t_min, t_max, active,
                       ray_mask=None, max_leaf: int = 4,
                       stack_size: int = MAX_STACK_SIZE,
                       force_xla: bool = False):
    """Two-level closest-hit trace.  Returns a :class:`HitInst`.

    Routes to the Pallas VMEM kernel (TPU + table fits), else the wide
    unified-table XLA machine when the scene packed one (build_wtlas);
    the binary machine is the fallback/spec path."""
    if _tlas_pallas_ok(nodes, force_xla):
        from ray_tpu.ops.traverse_pallas import trace_tlas_pallas

        t, prim, u, v, bf, inst_row = trace_tlas_pallas(
            nodes, ro, rd, t_min, t_max, active, ray_mask,
            max_leaf=max_leaf, stack_size=stack_size, any_hit=False,
        )
        return HitInst(
            t=t, prim=prim, u=u, v=v, backface=bf != 0,
            inst=jnp.where(prim >= 0, inst_row - nodes["winst_base"], -1),
        )
    if "wrows_tlas" in nodes:
        hit = _traverse_wide_tlas(
            nodes, ro, rd, t_min, t_max, active, ray_mask,
            max_leaf, stack_size, any_hit=False,
        )
    else:
        hit = _traverse_tlas(nodes, tris, inst, ro, rd, t_min, t_max, active,
                             ray_mask, max_leaf, stack_size, any_hit=False)
    return HitInst(
        t=jax.lax.stop_gradient(hit.t),
        prim=hit.prim,
        u=jax.lax.stop_gradient(hit.u),
        v=jax.lax.stop_gradient(hit.v),
        backface=hit.backface,
        inst=hit.inst,
    )


@partial(jax.jit, static_argnames=("max_leaf", "stack_size", "force_xla"))
def trace_occlusion_tlas(nodes, tris, inst, ro, rd, t_min, t_max, active,
                         ray_mask=None, max_leaf: int = 4,
                         stack_size: int = MAX_STACK_SIZE,
                         force_xla: bool = False):
    """Two-level any-hit trace: returns (R,) bool ``occluded``."""
    if _tlas_pallas_ok(nodes, force_xla):
        from ray_tpu.ops.traverse_pallas import trace_tlas_pallas

        _t, prim, _u, _v, _bf, _ir = trace_tlas_pallas(
            nodes, ro, rd, t_min, t_max, active, ray_mask,
            max_leaf=max_leaf, stack_size=stack_size, any_hit=True,
        )
        return prim >= 0
    if "wrows_tlas" in nodes:
        hit = _traverse_wide_tlas(
            nodes, ro, rd, t_min, t_max, active, ray_mask,
            max_leaf, stack_size, any_hit=True,
        )
        return hit.prim >= 0
    hit = _traverse_tlas(nodes, tris, inst, ro, rd, t_min, t_max, active,
                         ray_mask, max_leaf, stack_size, any_hit=True)
    return hit.prim >= 0
