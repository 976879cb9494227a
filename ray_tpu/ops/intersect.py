"""Ray/primitive intersection primitives (pure jnp, broadcast over wavefronts).

The reference precomputes Plücker planes per triangle (internal/Core.cpp:212
``PreprocessTri``) and tests against 48-byte ``tri_accel_t`` records.  On TPU
we intersect straight from the vertex buffer with Möller–Trumbore instead:
gathering 9 floats of raw geometry per triangle beats maintaining a second
precomputed copy in HBM, keeps the math differentiable w.r.t. vertices, and
the cross/dot products are pure VPU work.  Backfacing hits are reported with a
sign so shading can flip normals / handle two-sided materials, mirroring the
reference's signed-determinant convention (internal/CoreRef.cpp IntersectTris).
"""

from __future__ import annotations

import jax.numpy as jnp

from ray_tpu.ops.linalg import cross, dot

# The parallel-ray test must be scale-invariant: det is twice the projected
# triangle area, so ANY absolute epsilon silently rejects small triangles
# (a 77k-tri mat_test ball has ~5e-4 edges → det ≈ 2.5e-7, far below the
# 1e-6 this once used — whole triangles vanished).  det == 0.0 exactly is
# the only degenerate case; near-zero dets produce huge u/v/t that fail the
# barycentric/window tests on their own (inf/NaN compare False).  The
# reference's Plücker formulation (internal/Core.cpp:212 PreprocessTri)
# likewise has no absolute area cutoff.
HIT_EPS = 0.0


def intersect_tri(ro, rd, p0, p1, p2, t_min, t_max):
    """Möller–Trumbore ray/triangle test.

    All inputs broadcast; returns (hit, t, u, v, backface) where ``u, v`` are
    barycentrics of p1/p2 and ``backface`` is True when the ray hits the CW
    side (negative determinant).
    """
    e1 = p1 - p0
    e2 = p2 - p0
    pvec = cross(rd, e2)
    det = dot(e1, pvec, keepdims=False)
    valid_det = det != 0.0
    inv_det = 1.0 / jnp.where(valid_det, det, 1.0)
    tvec = ro - p0
    u = dot(tvec, pvec, keepdims=False) * inv_det
    qvec = cross(tvec, e1)
    v = dot(rd, qvec, keepdims=False) * inv_det
    t = dot(e2, qvec, keepdims=False) * inv_det
    hit = (
        valid_det
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return hit, t, u, v, det < 0.0


def intersect_aabb(ro, inv_d, box_lo, box_hi, t_min, t_max):
    """Slab test. Returns (hit, t_near). ``inv_d`` precomputed via safe_invert.

    The 1.00000024 watertight fudge factor follows the conservative-traversal
    convention (Ize, "Robust BVH Ray Traversal"); the reference applies the
    same idea in its box tests.
    """
    lo_t = (box_lo - ro) * inv_d
    hi_t = (box_hi - ro) * inv_d
    near = jnp.minimum(lo_t, hi_t)
    far = jnp.maximum(lo_t, hi_t)
    tn = jnp.maximum(jnp.max(near, axis=-1), t_min)
    tf = jnp.minimum(jnp.min(far, axis=-1), t_max)
    return tn <= tf * 1.00000024, tn
