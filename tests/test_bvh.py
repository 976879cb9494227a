"""BVH builder invariants + traversal vs brute-force parity."""

import jax.numpy as jnp
import numpy as np

from ray_tpu.ops.traverse import trace_closest, trace_closest_brute, trace_occlusion
from ray_tpu.scene import bvh as bvhmod
from ray_tpu.scene.bvh import build_bvh2, bvh_depth, tri_bounds


def random_tri_soup(n, seed=0, spread=10.0, size=0.8):
    r = np.random.RandomState(seed)
    base = (r.rand(n, 1, 3) - 0.5) * spread
    tris = base + (r.rand(n, 3, 3) - 0.5) * size
    vertices = tris.reshape(-1, 3).astype(np.float32)
    tri_vidx = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    return vertices, tri_vidx


def _check_invariants(b, n_prims):
    # every primitive appears exactly once in leaf order
    assert sorted(b.prim_indices.tolist()) == list(range(n_prims))
    # leaves respect max_leaf; child bounds contain their prim bounds
    seen = np.zeros(n_prims, bool)
    for i in range(b.num_nodes):
        for side in range(2):
            code = int(b.child[i, side])
            if code < 0:
                v = -code - 1
                first, count = v >> bvhmod.LEAF_COUNT_BITS, v & bvhmod.LEAF_COUNT_MASK
                assert count <= b.max_leaf
                assert count == b.counts[i, side]
                seen[b.prim_indices[first : first + count]] = True
            else:
                assert 0 <= code < b.num_nodes
    assert seen.all()
    assert bvh_depth(b) < bvhmod.MAX_STACK_SIZE


def test_builder_invariants_small():
    v, t = random_tri_soup(37, seed=1)
    lo, hi = tri_bounds(v, t)
    b = build_bvh2(lo, hi, max_leaf=4)
    _check_invariants(b, 37)


def test_builder_invariants_medium():
    v, t = random_tri_soup(5000, seed=2)
    lo, hi = tri_bounds(v, t)
    b = build_bvh2(lo, hi, max_leaf=4)
    _check_invariants(b, 5000)


def test_builder_single_leaf():
    v, t = random_tri_soup(3, seed=3)
    lo, hi = tri_bounds(v, t)
    b = build_bvh2(lo, hi, max_leaf=8)
    _check_invariants(b, 3)


def test_builder_degenerate_identical_centroids():
    # all triangles at the same location — SAH can't split, median must
    v0, t0 = random_tri_soup(1, seed=4)
    v = np.tile(v0, (40, 1)).astype(np.float32)
    t = (np.arange(40 * 3, dtype=np.int32)).reshape(40, 3)
    lo, hi = tri_bounds(v, t)
    b = build_bvh2(lo, hi, max_leaf=4)
    _check_invariants(b, 40)


def _random_rays(n, seed, spread=12.0):
    r = np.random.RandomState(seed)
    ro = (r.rand(n, 3).astype(np.float32) - 0.5) * spread
    rd = r.randn(n, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_traversal_matches_brute_force():
    v, t = random_tri_soup(800, seed=5)
    lo, hi = tri_bounds(v, t)
    b = build_bvh2(lo, hi, max_leaf=4)
    _check_invariants(b, 800)

    R = 512
    ro, rd = _random_rays(R, seed=6)
    t_min = jnp.zeros(R)
    t_max = jnp.full(R, 1e30)
    active = jnp.ones(R, bool)
    vj, tj = jnp.asarray(v), jnp.asarray(t)

    hit = trace_closest(
        jnp.asarray(b.child_lo), jnp.asarray(b.child_hi), jnp.asarray(b.child),
        jnp.asarray(b.prim_indices), vj, tj, ro, rd, t_min, t_max, active,
        max_leaf=b.max_leaf,
    )
    ref = trace_closest_brute(vj, tj, ro, rd, t_min, t_max, active)

    hit_mask = np.asarray(ref.prim) >= 0
    assert hit_mask.sum() > 50, "test scene too sparse to be meaningful"
    np.testing.assert_array_equal(np.asarray(hit.prim >= 0), hit_mask)
    np.testing.assert_allclose(
        np.asarray(hit.t)[hit_mask], np.asarray(ref.t)[hit_mask], rtol=1e-5
    )
    # prim ids can differ only for exactly-tied t values; require same t
    same = np.asarray(hit.prim) == np.asarray(ref.prim)
    np.testing.assert_allclose(
        np.asarray(hit.t)[~same], np.asarray(ref.t)[~same], rtol=1e-6
    )


def test_occlusion_matches_brute_force():
    v, t = random_tri_soup(400, seed=7)
    lo, hi = tri_bounds(v, t)
    b = build_bvh2(lo, hi, max_leaf=4)

    R = 256
    ro, rd = _random_rays(R, seed=8)
    t_min = jnp.zeros(R)
    t_max = jnp.full(R, 6.0)  # finite range so some rays escape
    active = jnp.ones(R, bool)
    vj, tj = jnp.asarray(v), jnp.asarray(t)

    occ = trace_occlusion(
        jnp.asarray(b.child_lo), jnp.asarray(b.child_hi), jnp.asarray(b.child),
        jnp.asarray(b.prim_indices), vj, tj, ro, rd, t_min, t_max, active,
        max_leaf=b.max_leaf,
    )
    ref = trace_closest_brute(vj, tj, ro, rd, t_min, t_max, active)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref.prim) >= 0)


def test_inactive_rays_do_not_trace():
    v, t = random_tri_soup(100, seed=9)
    lo, hi = tri_bounds(v, t)
    b = build_bvh2(lo, hi, max_leaf=4)
    R = 64
    ro, rd = _random_rays(R, seed=10)
    active = jnp.zeros(R, bool)
    hit = trace_closest(
        jnp.asarray(b.child_lo), jnp.asarray(b.child_hi), jnp.asarray(b.child),
        jnp.asarray(b.prim_indices), jnp.asarray(v), jnp.asarray(t),
        ro, rd, jnp.zeros(R), jnp.full(R, 1e30), active, max_leaf=b.max_leaf,
    )
    assert (np.asarray(hit.prim) == -1).all()
