"""SBVH spatial-split builder: invariants, brute-force traversal parity,
and render equivalence (emissive-light dedupe under duplicated refs).

Capability analogue of the reference's spatial-split SAH path
(internal/BVHSplit.h:20 ``SplitPrimitives_SAH`` clip_axis; settings
Core.h:241 oversplit_threshold)."""

import jax.numpy as jnp
import numpy as np

from ray_tpu.ops.traverse import trace_closest, trace_closest_brute
from ray_tpu.scene import bvh as bvhmod
from ray_tpu.scene.bvh import build_bvh2, bvh_depth, tri_bounds


def diagonal_tri_soup(n, seed=0, spread=10.0, length=4.0):
    """Long thin diagonal triangles — the SBVH stress case: object splits
    produce heavily overlapping children, spatial splits clip through."""
    r = np.random.RandomState(seed)
    base = (r.rand(n, 3) - 0.5) * spread
    d = r.rand(n, 3) - 0.5
    d = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)
    w = np.cross(d, r.rand(n, 3) - 0.5)
    w = w / np.maximum(np.linalg.norm(w, axis=1, keepdims=True), 1e-9)
    p0 = base
    p1 = base + d * length
    p2 = base + d * length * 0.5 + w * 0.05
    tris = np.stack([p0, p1, p2], axis=1).astype(np.float32)
    vertices = tris.reshape(-1, 3)
    tri_vidx = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    return vertices, tri_vidx


def _check_sbvh_invariants(b, n_prims):
    # every primitive appears at LEAST once; duplicates allowed
    present = np.zeros(n_prims, bool)
    present[b.prim_indices] = True
    assert present.all()
    for i in range(b.num_nodes):
        for side in range(2):
            code = int(b.child[i, side])
            if code < 0:
                v = -code - 1
                count = v & bvhmod.LEAF_COUNT_MASK
                first = v >> bvhmod.LEAF_COUNT_BITS
                assert count <= b.max_leaf
                assert first + count <= b.prim_indices.shape[0]
            else:
                assert 0 <= code < b.num_nodes
    assert bvh_depth(b) < bvhmod.MAX_STACK_SIZE


def _random_rays(n, seed, spread=12.0):
    r = np.random.RandomState(seed)
    ro = (r.rand(n, 3) - 0.5) * spread
    rd = r.rand(n, 3) - 0.5
    rd = rd / np.maximum(np.linalg.norm(rd, axis=1, keepdims=True), 1e-9)
    return jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32)


def test_sbvh_invariants_and_duplicates():
    v, t = diagonal_tri_soup(400, seed=5)
    lo, hi = tri_bounds(v, t)
    b = build_bvh2(lo, hi, max_leaf=4, spatial_splits=True, tri_verts=v[t])
    _check_sbvh_invariants(b, 400)
    # the diagonal soup must actually trigger reference splitting
    assert b.prim_indices.shape[0] > 400


def test_sbvh_traversal_matches_brute():
    n = 300
    v, t = diagonal_tri_soup(n, seed=7)
    lo, hi = tri_bounds(v, t)
    b = build_bvh2(lo, hi, max_leaf=4, spatial_splits=True, tri_verts=v[t])
    _check_sbvh_invariants(b, n)

    R = 512
    ro, rd = _random_rays(R, seed=11)
    t_min = jnp.zeros(R)
    t_max = jnp.full((R,), 1e9)
    active = jnp.ones(R, bool)
    vj, tj = jnp.asarray(v), jnp.asarray(t)
    hit = trace_closest(
        jnp.asarray(b.child_lo), jnp.asarray(b.child_hi),
        jnp.asarray(b.child), jnp.asarray(b.prim_indices),
        vj, tj, ro, rd, t_min, t_max, active,
        max_leaf=b.max_leaf, stack_size=bvh_depth(b) + 4,
    )
    ref = trace_closest_brute(vj, tj, ro, rd, t_min, t_max, active)
    np.testing.assert_array_equal(np.asarray(hit.prim), np.asarray(ref.prim))
    np.testing.assert_allclose(
        np.asarray(hit.t), np.asarray(ref.t), rtol=1e-5, atol=1e-5
    )


def test_sbvh_clipping_without_verts_matches_brute():
    # conservative AABB-clip path (no tri_verts) must stay exact too
    n = 200
    v, t = diagonal_tri_soup(n, seed=13)
    lo, hi = tri_bounds(v, t)
    b = build_bvh2(lo, hi, max_leaf=4, spatial_splits=True)
    _check_sbvh_invariants(b, n)
    R = 256
    ro, rd = _random_rays(R, seed=17)
    t_min = jnp.zeros(R)
    t_max = jnp.full((R,), 1e9)
    active = jnp.ones(R, bool)
    vj, tj = jnp.asarray(v), jnp.asarray(t)
    hit = trace_closest(
        jnp.asarray(b.child_lo), jnp.asarray(b.child_hi),
        jnp.asarray(b.child), jnp.asarray(b.prim_indices),
        vj, tj, ro, rd, t_min, t_max, active,
        max_leaf=b.max_leaf, stack_size=bvh_depth(b) + 4,
    )
    ref = trace_closest_brute(vj, tj, ro, rd, t_min, t_max, active)
    np.testing.assert_array_equal(np.asarray(hit.prim), np.asarray(ref.prim))


def test_sbvh_render_matches_object_split():
    """finalize(spatial_splits=True) must render the same image: duplicated
    emissive leaf refs are deduped into ONE light (flux counted once)."""
    from ray_tpu.render.integrator import PassSettings
    from ray_tpu.render.renderer import Renderer, RenderSettings
    from ray_tpu.utils.test_scenes import cornell_scene

    sc, cam = cornell_scene()
    flat_a = sc.finalize()
    sc2, cam2 = cornell_scene()
    flat_b = sc2.finalize(spatial_splits=True)
    # light COUNT must match (dup refs deduped to one TRI light each);
    # leaf-order tri indices inside the table may legitimately differ
    la = {k: np.asarray(v) for k, v in flat_a.lights.items()}
    lb = {k: np.asarray(v) for k, v in flat_b.lights.items()}
    for k in la:
        assert la[k].shape == lb[k].shape, k

    r = Renderer(
        RenderSettings(24, 24),
        PassSettings(max_total_depth=3, min_total_depth=3),
    )
    img_a = np.asarray(r.render(flat_a, cam, 4))
    r2 = Renderer(
        RenderSettings(24, 24),
        PassSettings(max_total_depth=3, min_total_depth=3),
    )
    img_b = np.asarray(r2.render(flat_b, cam2, 4))
    np.testing.assert_allclose(img_a, img_b, rtol=1e-4, atol=1e-4)


def test_sbvh_native_matches_brute():
    from ray_tpu.scene import native

    if not native.available():
        import pytest

        pytest.skip("no native toolchain")
    n = 2000
    v, t = diagonal_tri_soup(n, seed=23)
    lo, hi = tri_bounds(v, t)
    b = build_bvh2(lo, hi, max_leaf=4, spatial_splits=True, tri_verts=v[t],
                   use_native="always")
    _check_sbvh_invariants(b, n)
    assert b.prim_indices.shape[0] > n  # spatial splits actually fired

    R = 512
    ro, rd = _random_rays(R, seed=29)
    t_min = jnp.zeros(R)
    t_max = jnp.full((R,), 1e9)
    active = jnp.ones(R, bool)
    vj, tj = jnp.asarray(v), jnp.asarray(t)
    hit = trace_closest(
        jnp.asarray(b.child_lo), jnp.asarray(b.child_hi),
        jnp.asarray(b.child), jnp.asarray(b.prim_indices),
        vj, tj, ro, rd, t_min, t_max, active,
        max_leaf=b.max_leaf, stack_size=bvh_depth(b) + 4,
    )
    ref = trace_closest_brute(vj, tj, ro, rd, t_min, t_max, active)
    np.testing.assert_array_equal(np.asarray(hit.prim), np.asarray(ref.prim))
    np.testing.assert_allclose(
        np.asarray(hit.t), np.asarray(ref.t), rtol=1e-5, atol=1e-5
    )
