"""8-wide BVH (reference wbvh_node_t, Core.h:118): collapse invariants and
hit equality vs brute force / the binary wavefront."""

import jax.numpy as jnp
import numpy as np

from ray_tpu.ops.traverse import (
    _traverse_wide,
    trace_closest_brute,
    trace_closest_soa,
    trace_occlusion_soa,
)
from ray_tpu.scene.bvh import (
    build_bvh2,
    bvh_depth,
    pack_bvh_soa,
    pack_tri_soa,
    tri_bounds,
)
from ray_tpu.scene.wbvh import EMPTY, build_wbvh

RNG = np.random.default_rng(3)


def _soup(n, spread=8.0):
    base = RNG.uniform(-spread, spread, (n, 1, 3))
    tris = (base + RNG.uniform(-0.5, 0.5, (n, 3, 3))).astype(np.float32)
    verts = tris.reshape(-1, 3)
    idx = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    return verts, idx


def _rays(R, verts, idx):
    ro = RNG.uniform(-10, 10, (R, 3)).astype(np.float32)
    targets = verts[idx[RNG.integers(0, idx.shape[0], R)]].mean(axis=1)
    d = targets - ro
    rd = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_wbvh_structure():
    verts, idx = _soup(500)
    lo, hi = tri_bounds(verts, idx)
    b = build_bvh2(lo, hi, max_leaf=4, use_native="never")
    soa = pack_tri_soa(verts, idx[b.prim_indices])
    wb = build_wbvh(b, soa["packed"])
    rows = wb["wrows"]
    assert rows.shape[1] == 56  # max(56, 11*max_leaf) for max_leaf=4
    codes_all = rows[:, 48:56].view(np.int32)
    # node rows come first: find the node/leaf boundary from child codes
    leaf_refs = codes_all[(codes_all < 0) & (codes_all != EMPTY)]
    n_nodes = int((-leaf_refs - 1).min())
    # every leaf-order prim appears exactly once across leaf groups
    prims = rows[n_nodes:, 36:40].view(np.int32).reshape(-1)
    prims = prims[prims >= 0]
    assert sorted(prims.tolist()) == list(range(500))
    # wide nodes average >2 used children (the collapse actually widened)
    codes = rows[:n_nodes, 48:56].view(np.int32)
    used = (codes != EMPTY).sum(axis=1)
    assert used.mean() > 2.5


def test_wide_hits_match_brute():
    verts, idx = _soup(900)
    lo, hi = tri_bounds(verts, idx)
    b = build_bvh2(lo, hi, max_leaf=4, use_native="never")
    soa = pack_tri_soa(verts, idx[b.prim_indices])
    wb = build_wbvh(b, soa["packed"])
    wn = {"wrows": jnp.asarray(wb["wrows"])}

    R = 2048
    ro, rd = _rays(R, verts, idx)
    t0 = jnp.zeros((R,), jnp.float32)
    t1 = jnp.full((R,), 1e30, jnp.float32)
    act = jnp.ones((R,), jnp.bool_)

    hw = _traverse_wide(wn, ro, rd, t0, t1, act, max_leaf=4,
                        stack_size=bvh_depth(b) + 4, any_hit=False)
    ref = trace_closest_brute(
        jnp.asarray(verts), jnp.asarray(idx[b.prim_indices]),
        ro, rd, t0, t1, act,
    )
    assert float((np.asarray(ref.prim) >= 0).mean()) > 0.5
    np.testing.assert_array_equal(
        np.asarray(hw.prim) >= 0, np.asarray(ref.prim) >= 0
    )
    same = np.asarray(hw.prim) == np.asarray(ref.prim)
    assert same.mean() > 0.995  # ties/rounding only
    m = (np.asarray(ref.prim) >= 0) & same
    # cross-implementation rounding (_tri_c vs intersect_tri) → ~1e-3
    np.testing.assert_allclose(
        np.asarray(hw.t)[m], np.asarray(ref.t)[m], rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(hw.t)[~same], np.asarray(ref.t)[~same], rtol=1e-2
    )
    # inactive lanes stay misses
    hw2 = _traverse_wide(wn, ro, rd, t0, t1, jnp.zeros((R,), jnp.bool_),
                         max_leaf=4, stack_size=bvh_depth(b) + 4,
                         any_hit=False)
    assert (np.asarray(hw2.prim) == -1).all()


def test_wide_dispatch_in_trace_soa():
    """Scenes above the wide threshold route through _traverse_wide via the
    'wrows' key and agree with the bvh2 wavefront."""
    verts, idx = _soup(600)
    lo, hi = tri_bounds(verts, idx)
    b = build_bvh2(lo, hi, max_leaf=4, use_native="never")
    soa = pack_tri_soa(verts, idx[b.prim_indices])
    bvh = pack_bvh_soa(b)
    wb = build_wbvh(b, soa["packed"])
    bvh_w = dict(bvh, wrows=wb["wrows"])

    R = 1024
    ro, rd = _rays(R, verts, idx)
    t0 = jnp.zeros((R,), jnp.float32)
    t1 = jnp.full((R,), 1e30, jnp.float32)
    act = jnp.ones((R,), jnp.bool_)
    args = (ro, rd, t0, t1, act)
    kw = dict(max_leaf=4, stack_size=bvh_depth(b) + 4)

    h2 = trace_closest_soa(bvh, soa, *args, **kw)
    hw = trace_closest_soa(bvh_w, soa, *args, **kw)
    same = np.asarray(h2.prim) == np.asarray(hw.prim)
    assert same.mean() > 0.995  # exact-tie winners may differ
    np.testing.assert_allclose(
        np.asarray(h2.t)[same], np.asarray(hw.t)[same], rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(h2.t)[~same], np.asarray(hw.t)[~same], rtol=1e-2
    )

    o2 = trace_occlusion_soa(bvh, soa, *args, **kw)
    ow = trace_occlusion_soa(bvh_w, soa, *args, **kw)
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(ow))


def test_wide_visibility_masks():
    verts, idx = _soup(400)
    lo, hi = tri_bounds(verts, idx)
    b = build_bvh2(lo, hi, max_leaf=4, use_native="never")
    soa = pack_tri_soa(verts, idx[b.prim_indices])
    # half the tris visible only to bit 1, half to bit 2 (leaf order)
    tri_vis = np.where(np.arange(400) % 2 == 0, 1, 2).astype(np.int32)
    wb = build_wbvh(b, soa["packed"], tri_vis)
    bvh_w = dict(pack_bvh_soa(b), wrows=wb["wrows"])

    R = 1024
    ro, rd = _rays(R, verts, idx)
    t0 = jnp.zeros((R,), jnp.float32)
    t1 = jnp.full((R,), 1e30, jnp.float32)
    act = jnp.ones((R,), jnp.bool_)
    mask1 = jnp.full((R,), 1, jnp.int32)

    h = trace_closest_soa(bvh_w, soa, ro, rd, t0, t1, act,
                          max_leaf=4, stack_size=bvh_depth(b) + 4,
                          tri_vis=jnp.asarray(tri_vis), ray_mask=mask1)
    p = np.asarray(h.prim)
    hit = p >= 0
    assert hit.any()
    assert (p[hit] % 2 == 0).all()   # only even (bit-1) tris visible
