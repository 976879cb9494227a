"""HLBVH / Morton fast builder (reference PreprocessPrims_HLBVH,
internal/Core.cpp:330-574): structural invariants + identical hits vs the
SAH tree."""

import jax.numpy as jnp
import numpy as np

from ray_tpu.ops.traverse import trace_closest_soa
from ray_tpu.scene.bvh import (
    LEAF_COUNT_BITS,
    LEAF_COUNT_MASK,
    bvh_depth,
    build_bvh2,
    pack_bvh_soa,
    pack_tri_soa,
    tri_bounds,
)
from ray_tpu.scene.hlbvh import build_hlbvh, morton30

RNG = np.random.default_rng(11)


def _tri_soup(n, spread=10.0):
    base = RNG.uniform(-spread, spread, (n, 1, 3))
    tris = base + RNG.uniform(-0.4, 0.4, (n, 3, 3))
    verts = tris.reshape(-1, 3).astype(np.float32)
    idx = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    return verts, idx


def _leaf_ranges(bvh):
    out = []
    for s in range(bvh.num_nodes):
        for side in range(2):
            c = int(bvh.child[s, side])
            if c < 0:
                enc = -c - 1
                first = enc >> LEAF_COUNT_BITS
                count = enc & LEAF_COUNT_MASK
                if count:
                    out.append((first, count))
    return out


def test_morton_codes_are_spatially_sorted():
    pts = RNG.uniform(0, 1, (1000, 3)).astype(np.float32)
    codes = morton30(pts, np.zeros(3, np.float32), np.ones(3, np.float32))
    # same cell → same code; distant octants → different high bits
    a = morton30(np.array([[0.1, 0.1, 0.1]]), np.zeros(3), np.ones(3))
    b = morton30(np.array([[0.9, 0.9, 0.9]]), np.zeros(3), np.ones(3))
    assert a[0] != b[0]
    assert codes.shape == (1000,)


def test_hlbvh_invariants():
    verts, idx = _tri_soup(777)
    lo, hi = tri_bounds(verts, idx)
    bvh = build_hlbvh(lo, hi, max_leaf=4)
    # every prim appears in exactly one leaf range
    seen = np.zeros(777, bool)
    for first, count in _leaf_ranges(bvh):
        r = bvh.prim_indices[first:first + count]
        assert not seen[r].any()
        seen[r] = True
    assert seen.all()
    # child AABBs contain their prims
    for s in range(bvh.num_nodes):
        for side in range(2):
            c = int(bvh.child[s, side])
            if c < 0:
                enc = -c - 1
                first = enc >> LEAF_COUNT_BITS
                count = enc & LEAF_COUNT_MASK
                if not count:
                    continue
                p = bvh.prim_indices[first:first + count]
                assert (lo[p] >= bvh.child_lo[s, side] - 1e-4).all()
                assert (hi[p] <= bvh.child_hi[s, side] + 1e-4).all()
    assert bvh_depth(bvh) < 64


def test_hlbvh_hits_match_sah():
    verts, idx = _tri_soup(400)
    lo, hi = tri_bounds(verts, idx)
    sah = build_bvh2(lo, hi, max_leaf=4, use_native="never")
    hlb = build_hlbvh(lo, hi, max_leaf=4)

    R = 4096
    ro_np = RNG.uniform(-12, 12, (R, 3)).astype(np.float32)
    # aim at random triangle centroids so most rays hit something
    targets = verts[idx[RNG.integers(0, idx.shape[0], R)]].mean(axis=1)
    d = targets - ro_np
    ro = jnp.asarray(ro_np)
    rd = jnp.asarray((d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32))
    t0 = jnp.zeros((R,), jnp.float32)
    t1 = jnp.full((R,), 1e30, jnp.float32)
    act = jnp.ones((R,), jnp.bool_)

    hits = []
    for bvh in (sah, hlb):
        h = trace_closest_soa(
            pack_bvh_soa(bvh), pack_tri_soa(verts, idx[bvh.prim_indices]),
            ro, rd, t0, t1, act,
            max_leaf=4, stack_size=bvh_depth(bvh) + 4,
        )
        # map leaf-order prim back to original id
        prim = np.asarray(h.prim)
        orig = np.where(prim >= 0, bvh.prim_indices[np.maximum(prim, 0)], -1)
        hits.append((np.asarray(h.t), orig))

    (t_s, p_s), (t_h, p_h) = hits
    assert (p_s >= 0).mean() > 0.3        # decent hit rate in the soup
    np.testing.assert_allclose(t_s, t_h, rtol=1e-5, atol=1e-6)
    assert (p_s == p_h).mean() > 0.999    # ties may differ, nothing else


def test_hlbvh_handles_small_and_degenerate():
    # single triangle
    verts, idx = _tri_soup(1)
    lo, hi = tri_bounds(verts, idx)
    b = build_hlbvh(lo, hi, max_leaf=4)
    assert b.num_nodes == 1 and b.counts[0, 0] == 1
    # all-identical centroids (degenerate Morton codes — tie-break by index)
    verts = np.tile(_tri_soup(1)[0], (50, 1))
    idx = np.arange(150, dtype=np.int32).reshape(50, 3)
    lo, hi = tri_bounds(verts, idx)
    b = build_hlbvh(lo, hi, max_leaf=4)
    seen = np.zeros(50, bool)
    for first, count in _leaf_ranges(b):
        seen[b.prim_indices[first:first + count]] = True
    assert seen.all()


def test_hlbvh_scene_render_parity():
    """fast_build=True renders the same image (up to closest-hit
    tie-breaking on touching triangles — different leaf order can pick a
    different winner on shared edges, changing that pixel's RNG path)."""
    from ray_tpu.render.integrator import PassSettings
    from ray_tpu.render.renderer import Renderer, RenderSettings
    from ray_tpu.utils.test_scenes import cornell_scene

    sc, cam = cornell_scene("emissive_quad")
    imgs = []
    for fast in (False, True):
        scene = sc.finalize(fast_build=fast)
        r = Renderer(
            RenderSettings(width=24, height=24),
            PassSettings(max_total_depth=3, min_total_depth=3),
        )
        imgs.append(r.render(scene, cam, samples=8))
    d = np.abs(imgs[0] - imgs[1]).max(axis=-1)
    assert (d > 1e-5).mean() < 0.01      # ≤1% tie-break pixels
    assert np.median(d) == 0.0
