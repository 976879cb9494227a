"""Wavefront BVH traversal, vectorized over the whole ray population.

This replaces the reference's per-ray recursive-stack traversal
(internal/CoreRef.cpp:1890-2740 ``Traverse_TLAS/BLAS_WithStack_*``) with a
TPU-native formulation: *all* rays advance one traversal step per iteration
of a single ``lax.while_loop``, each holding a private stack in a fixed
``[R, STACK]`` array.  A step pops one stack entry; internal entries test the
two child AABBs stored in the parent slot (pure VPU math on gathered node
records) and push the hit children near-first, leaf entries intersect their
``≤ max_leaf`` triangles as one fixed-size vectorized block.  Divergence
costs idle lanes rather than scalar branches — the standard trade on a
vector machine — and is bounded by sorting rays between bounces
(ray_tpu.render sort stage, mirroring internal/CoreRef.cpp:1667 SortRays).

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

from ray_tpu.ops.intersect import intersect_aabb, intersect_tri
from ray_tpu.ops.linalg import safe_invert
from ray_tpu.scene.bvh import LEAF_COUNT_BITS, LEAF_COUNT_MASK, MAX_STACK_SIZE


class Hit(NamedTuple):
    """Closest-hit record (SoA over rays), analogue of ``hit_data_t``
    (reference internal/CoreRef.h:89)."""

    t: jnp.ndarray          # f32, distance (t_max if miss)
    prim: jnp.ndarray       # i32, triangle index into scene order (-1 = miss)
    u: jnp.ndarray          # f32 barycentric of vertex 1
    v: jnp.ndarray          # f32 barycentric of vertex 2
    backface: jnp.ndarray   # bool


def _decode_leaf(code):
    v = -code - 1
    return v >> LEAF_COUNT_BITS, v & LEAF_COUNT_MASK


@partial(jax.jit, static_argnames=("max_leaf",))
def trace_closest(
    nodes_child_lo,
    nodes_child_hi,
    nodes_child,
    prim_indices,
    vertices,
    tri_vidx,
    ro,
    rd,
    t_min,
    t_max,
    active,
    max_leaf: int = 4,
):
    """Closest-hit trace of R rays against one flattened BVH2.

    Args:
      nodes_child_lo/hi: (N, 2, 3) f32 children bounds per slot.
      nodes_child: (N, 2) i32 child codes.
      prim_indices: (T,) i32 leaf-order permutation of triangles.
      vertices: (V, 3) f32; tri_vidx: (T, 3) i32.
      ro, rd: (R, 3) f32 origins/directions.
      t_min, t_max: (R,) f32 ray interval.
      active: (R,) bool — dead rays never traverse.

    Returns a :class:`Hit`.
    """
    R = ro.shape[0]
    rows = jnp.arange(R, dtype=jnp.int32)
    inv_d = safe_invert(rd)

    stack0 = jnp.zeros((R, MAX_STACK_SIZE), jnp.int32)
    sp0 = jnp.where(active, 1, 0).astype(jnp.int32)  # entry 0 = root slot code 0

    hit0 = Hit(
        t=jnp.asarray(t_max, jnp.float32),
        prim=jnp.full((R,), -1, jnp.int32),
        u=jnp.zeros((R,), jnp.float32),
        v=jnp.zeros((R,), jnp.float32),
        backface=jnp.zeros((R,), jnp.bool_),
    )

    def cond(state):
        _, sp, _ = state
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, hit = state
        act = sp > 0
        top = jnp.maximum(sp - 1, 0)
        code = jnp.take_along_axis(stack, top[:, None], axis=1)[:, 0]
        sp = jnp.where(act, sp - 1, sp)

        is_node = act & (code >= 0)
        is_leaf = act & (code < 0)
        node = jnp.where(is_node, code, 0)

        # ---- internal: test both children, push hit children near-first ----
        c_lo = nodes_child_lo[node]          # (R, 2, 3)
        c_hi = nodes_child_hi[node]
        c_code = nodes_child[node]           # (R, 2)
        h0, t0 = intersect_aabb(ro, inv_d, c_lo[:, 0], c_hi[:, 0], t_min, hit.t)
        h1, t1 = intersect_aabb(ro, inv_d, c_lo[:, 1], c_hi[:, 1], t_min, hit.t)
        near_is_0 = t0 <= t1
        near_code = jnp.where(near_is_0, c_code[:, 0], c_code[:, 1])
        far_code = jnp.where(near_is_0, c_code[:, 1], c_code[:, 0])
        near_hit = jnp.where(near_is_0, h0, h1) & is_node
        far_hit = jnp.where(near_is_0, h1, h0) & is_node

        # push far first so near pops first; masked scatter via OOB drop
        far_slot = jnp.where(far_hit, sp, MAX_STACK_SIZE)
        stack = stack.at[rows, far_slot].set(far_code, mode="drop")
        sp = sp + far_hit.astype(jnp.int32)
        near_slot = jnp.where(near_hit, sp, MAX_STACK_SIZE)
        stack = stack.at[rows, near_slot].set(near_code, mode="drop")
        sp = sp + near_hit.astype(jnp.int32)

        # ---- leaf: fixed-size vectorized block of triangle tests ----
        first, count = _decode_leaf(jnp.where(is_leaf, code, -1))
        t_best, prim_best, u_best, v_best, bf_best = (
            hit.t, hit.prim, hit.u, hit.v, hit.backface,
        )
        for k in range(max_leaf):
            valid = is_leaf & (k < count)
            slot = jnp.where(valid, first + k, 0)
            tri = prim_indices[slot]                       # (R,)
            vidx = tri_vidx[tri]                           # (R, 3)
            p0 = vertices[vidx[:, 0]]
            p1 = vertices[vidx[:, 1]]
            p2 = vertices[vidx[:, 2]]
            th, tt, tu, tv, tb = intersect_tri(ro, rd, p0, p1, p2, t_min, t_best)
            take = th & valid
            t_best = jnp.where(take, tt, t_best)
            prim_best = jnp.where(take, tri, prim_best)
            u_best = jnp.where(take, tu, u_best)
            v_best = jnp.where(take, tv, v_best)
            bf_best = jnp.where(take, tb, bf_best)

        new_hit = Hit(t=t_best, prim=prim_best, u=u_best, v=v_best, backface=bf_best)
        return stack, sp, new_hit

    _, _, hit = jax.lax.while_loop(cond, body, (stack0, sp0, hit0))
    return Hit(
        t=jax.lax.stop_gradient(hit.t),
        prim=hit.prim,
        u=jax.lax.stop_gradient(hit.u),
        v=jax.lax.stop_gradient(hit.v),
        backface=hit.backface,
    )


@partial(jax.jit, static_argnames=("max_leaf",))
def trace_occlusion(
    nodes_child_lo,
    nodes_child_hi,
    nodes_child,
    prim_indices,
    vertices,
    tri_vidx,
    ro,
    rd,
    t_min,
    t_max,
    active,
    max_leaf: int = 4,
):
    """Any-hit (shadow) trace: returns (R,) bool ``occluded``.

    Early-out per ray: as soon as a hit is found the ray's stack is cleared,
    mirroring the reference's AnyHit traversal (internal/CoreRef.cpp:2135).
    Alpha-tested/transparent occluders are handled a level up (shade stage)
    once transparency lands; this kernel treats every triangle as solid.
    """
    R = ro.shape[0]
    rows = jnp.arange(R, dtype=jnp.int32)
    inv_d = safe_invert(rd)

    stack0 = jnp.zeros((R, MAX_STACK_SIZE), jnp.int32)
    sp0 = jnp.where(active, 1, 0).astype(jnp.int32)
    occ0 = jnp.zeros((R,), jnp.bool_)

    def cond(state):
        _, sp, _ = state
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, occ = state
        act = sp > 0
        top = jnp.maximum(sp - 1, 0)
        code = jnp.take_along_axis(stack, top[:, None], axis=1)[:, 0]
        sp = jnp.where(act, sp - 1, sp)

        is_node = act & (code >= 0)
        is_leaf = act & (code < 0)
        node = jnp.where(is_node, code, 0)

        c_lo = nodes_child_lo[node]
        c_hi = nodes_child_hi[node]
        c_code = nodes_child[node]
        h0, _ = intersect_aabb(ro, inv_d, c_lo[:, 0], c_hi[:, 0], t_min, t_max)
        h1, _ = intersect_aabb(ro, inv_d, c_lo[:, 1], c_hi[:, 1], t_min, t_max)
        h0 = h0 & is_node
        h1 = h1 & is_node

        slot0 = jnp.where(h0, sp, MAX_STACK_SIZE)
        stack = stack.at[rows, slot0].set(c_code[:, 0], mode="drop")
        sp = sp + h0.astype(jnp.int32)
        slot1 = jnp.where(h1, sp, MAX_STACK_SIZE)
        stack = stack.at[rows, slot1].set(c_code[:, 1], mode="drop")
        sp = sp + h1.astype(jnp.int32)

        first, count = _decode_leaf(jnp.where(is_leaf, code, -1))
        found = jnp.zeros((R,), jnp.bool_)
        for k in range(max_leaf):
            valid = is_leaf & (k < count)
            slot = jnp.where(valid, first + k, 0)
            tri = prim_indices[slot]
            vidx = tri_vidx[tri]
            p0 = vertices[vidx[:, 0]]
            p1 = vertices[vidx[:, 1]]
            p2 = vertices[vidx[:, 2]]
            th, _, _, _, _ = intersect_tri(ro, rd, p0, p1, p2, t_min, t_max)
            found = found | (th & valid)

        occ = occ | found
        sp = jnp.where(found, 0, sp)  # early-out: clear this ray's stack
        return stack, sp, occ

    _, _, occ = jax.lax.while_loop(cond, body, (stack0, sp0, occ0))
    return occ


def trace_closest_brute(vertices, tri_vidx, ro, rd, t_min, t_max, active):
    """O(R·T) reference intersector for tests — the executable spec the BVH
    traversal must match exactly (same role as the reference's scalar Ref
    backend vs its SIMD/GPU backends, SURVEY.md §4)."""
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
