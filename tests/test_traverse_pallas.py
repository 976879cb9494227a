"""Pallas↔XLA bit-equivalence on the real TPU chip.

The Pallas VMEM kernels (ops/traverse_pallas.py) are the fast path behind
the flagship bench numbers; the XLA wavefront loop is the executable spec
(the role Ref::SIMDPolicy plays for the reference's SIMD backends,
internal/RendererCPU.h:29).  These tests force both paths on identical
random scenes/rays and assert *identical* hit records — the analogue of
the reference's cross-backend golden matrix (SURVEY §4).

Runs on hardware only: ``RAY_TPU_HW=1 python -m pytest
tests/test_traverse_pallas.py`` (bench.py runs it before benching; the
CPU-pinned unit suite skips it).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RAY_TPU_HW", "") != "1"
    and os.environ.get("RAY_TPU_GOLDEN", "") != "1",
    reason="needs the real TPU (Pallas kernels); run via bench.py --tpu-tests",
)


def _require_tpu():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend available")


def _scene(n_tris, seed):
    import jax.numpy as jnp

    from ray_tpu.ops.traverse import _soa_from_arrays
    from ray_tpu.scene.bvh import build_bvh2, tri_bounds

    r = np.random.RandomState(seed)
    base = (r.rand(n_tris, 1, 3) - 0.5) * 10.0
    # triangle size scales down with count so random rays hit a useful
    # fraction of the scene at every size tier
    size = max(0.8, 12.0 / np.sqrt(n_tris))
    tris = base + (r.rand(n_tris, 3, 3) - 0.5) * size
    v = tris.reshape(-1, 3).astype(np.float32)
    t = np.arange(3 * n_tris, dtype=np.int32).reshape(n_tris, 3)
    lo, hi = tri_bounds(v, t)
    b = build_bvh2(lo, hi, max_leaf=4)
    bvh, tsoa = _soa_from_arrays(
        jnp.asarray(b.child_lo), jnp.asarray(b.child_hi),
        jnp.asarray(b.child), jnp.asarray(b.prim_indices),
        jnp.asarray(v), jnp.asarray(t),
    )
    return bvh, tsoa, b.max_leaf


def _rays(n, seed):
    import jax.numpy as jnp

    r = np.random.RandomState(seed)
    ro = (r.rand(n, 3).astype(np.float32) - 0.5) * 12.0
    # aim at random points inside the triangle cloud so sparse scenes
    # still produce a meaningful hit count
    target = (r.rand(n, 3).astype(np.float32) - 0.5) * 6.0
    rd = target - ro
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return (jnp.asarray(ro), jnp.asarray(rd), jnp.zeros(n),
            jnp.full(n, 1e30), jnp.ones(n, bool))


# sizes exercising each dispatch tier (ops/traverse.py _pallas_mode):
# ≤40 → Pallas brute; ≤512 nodes/tris → Pallas BVH kernel
@pytest.mark.parametrize("n_tris", [8, 24, 100, 300, 500])
def test_closest_hit_bit_equal(n_tris):
    _require_tpu()
    from ray_tpu.ops.traverse import trace_closest_soa

    bvh, tsoa, max_leaf = _scene(n_tris, seed=n_tris)
    ro, rd, tmin, tmax, act = _rays(512, seed=1000 + n_tris)

    fast = trace_closest_soa(bvh, tsoa, ro, rd, tmin, tmax, act,
                             max_leaf=max_leaf)
    spec = trace_closest_soa(bvh, tsoa, ro, rd, tmin, tmax, act,
                             max_leaf=max_leaf, force_xla=True)

    assert np.asarray(fast.prim).tolist() == np.asarray(spec.prim).tolist()
    hitm = np.asarray(spec.prim) >= 0
    assert hitm.sum() > 20, "scene too sparse to be meaningful"
    for field in ("t", "u", "v"):
        a = np.asarray(getattr(fast, field))[hitm]
        b = np.asarray(getattr(spec, field))[hitm]
        np.testing.assert_array_equal(a, b, err_msg=field)
    np.testing.assert_array_equal(
        np.asarray(fast.backface)[hitm], np.asarray(spec.backface)[hitm])


@pytest.mark.parametrize("n_tris", [8, 100, 500])
def test_occlusion_bit_equal(n_tris):
    _require_tpu()
    from ray_tpu.ops.traverse import trace_occlusion_soa

    bvh, tsoa, max_leaf = _scene(n_tris, seed=77 + n_tris)
    ro, rd, tmin, tmax, act = _rays(512, seed=2000 + n_tris)
    # finite t_max exercises the early-out path
    import jax.numpy as jnp

    tmax = jnp.full(512, 4.0)

    fast = trace_occlusion_soa(bvh, tsoa, ro, rd, tmin, tmax, act,
                               max_leaf=max_leaf)
    spec = trace_occlusion_soa(bvh, tsoa, ro, rd, tmin, tmax, act,
                               max_leaf=max_leaf, force_xla=True)
    assert np.asarray(fast).tolist() == np.asarray(spec).tolist()
    assert np.asarray(spec).sum() > 10


def test_inactive_and_tmin_tmax_window():
    """Masked lanes + clipped windows agree across paths."""
    _require_tpu()
    import jax.numpy as jnp

    from ray_tpu.ops.traverse import trace_closest_soa

    bvh, tsoa, max_leaf = _scene(200, seed=5)
    ro, rd, _, _, _ = _rays(256, seed=6)
    r = np.random.RandomState(7)
    act = jnp.asarray(r.rand(256) > 0.3)
    tmin = jnp.asarray(r.rand(256).astype(np.float32) * 2.0)
    tmax = tmin + jnp.asarray(r.rand(256).astype(np.float32) * 6.0)

    fast = trace_closest_soa(bvh, tsoa, ro, rd, tmin, tmax, act,
                             max_leaf=max_leaf)
    spec = trace_closest_soa(bvh, tsoa, ro, rd, tmin, tmax, act,
                             max_leaf=max_leaf, force_xla=True)
    assert np.asarray(fast.prim).tolist() == np.asarray(spec.prim).tolist()
    assert (np.asarray(fast.prim)[~np.asarray(act)] == -1).all()
    hitm = np.asarray(spec.prim) >= 0
    np.testing.assert_array_equal(np.asarray(fast.t)[hitm],
                                  np.asarray(spec.t)[hitm])


def test_tlas_kernel_matches_xla_on_hw():
    """Compiled-on-TPU Pallas TLAS kernel vs the XLA wide-TLAS machine
    (the interpret-mode twin lives in tests/test_traverse_tlas_pallas.py):
    hit indices/instances exact, t/u/v to ULPs."""
    _require_tpu()
    import jax.numpy as jnp

    from ray_tpu.scene.materials import MaterialDesc, ShadingNode
    from ray_tpu.scene.scene import Scene
    from ray_tpu.utils.geometry import make_uv_sphere
    from ray_tpu.ops import traverse
    from ray_tpu.ops.traverse_pallas import trace_tlas_pallas

    sc = Scene()
    m = sc.add_material(MaterialDesc(type=ShadingNode.DIFFUSE))
    v, idx, n, uv = make_uv_sphere(radius=0.6, rings=12, segments=16)
    mesh = sc.add_mesh(v, idx, normals=n, uvs=uv, material=m)
    r = np.random.RandomState(11)
    for _ in range(8):
        x = np.eye(4, dtype=np.float32)
        x[0, 0] = x[1, 1] = x[2, 2] = r.uniform(0.5, 1.4)
        x[:3, 3] = r.uniform(-2, 2, 3)
        sc.add_instance(mesh, x)
    sc.set_environment((0.5, 0.5, 0.5))
    scene = sc.finalize(instancing="tlas")
    assert "wrows_tlas" in scene.bvh_soa

    R = 1024
    ro = jnp.asarray(r.uniform(-4, 4, (R, 3)).astype(np.float32))
    rd = r.randn(R, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rd = jnp.asarray(rd)
    tmin = jnp.zeros((R,), jnp.float32)
    tmax = jnp.full((R,), 1e30, jnp.float32)
    act = jnp.asarray(r.rand(R) > 0.1)

    xla = traverse._traverse_wide_tlas(
        scene.bvh_soa, ro, rd, tmin, tmax, act, None,
        scene.max_leaf, scene.stack_size, any_hit=False,
    )
    t, prim, u, v_, bf, inst_row = trace_tlas_pallas(
        scene.bvh_soa, ro, rd, tmin, tmax, act, None,
        max_leaf=scene.max_leaf, stack_size=scene.stack_size,
    )
    assert np.asarray(prim).tolist() == np.asarray(xla.prim).tolist()
    np.testing.assert_allclose(np.asarray(t), np.asarray(xla.t), rtol=1e-6)
    inst = jnp.where(prim >= 0, inst_row - scene.bvh_soa["winst_base"], -1)
    np.testing.assert_array_equal(np.asarray(inst), np.asarray(xla.inst))
    assert (np.asarray(prim) >= 0).sum() > 50


@pytest.mark.parametrize("n_tris", [20_000, 120_000])
def test_binned_kernel_matches_xla_on_hw(n_tris):
    """Big un-instanced scenes: the binned per-block-DMA kernel
    (trace_flat_binned) must return bit-identical hits to the XLA
    wavefront — VERDICT r4 #6: ≥100k-tri flattened scene through Pallas,
    ≥10k-ray coverage."""
    _require_tpu()
    import jax.numpy as jnp

    from ray_tpu.ops import traverse
    from ray_tpu.ops.traverse_pallas import CI, pack_binned_scene, trace_flat_binned
    from ray_tpu.scene.bvh import build_bvh2, pack_tri_soa, bvh_depth, tri_bounds

    r = np.random.RandomState(7)
    base = (r.rand(n_tris, 1, 3) - 0.5) * 10.0
    size = max(0.8, 12.0 / np.sqrt(n_tris))
    tris = base + (r.rand(n_tris, 3, 3) - 0.5) * size
    v = tris.reshape(-1, 3).astype(np.float32)
    t = np.arange(3 * n_tris, dtype=np.int32).reshape(n_tris, 3)
    lo, hi = tri_bounds(v, t)
    b = build_bvh2(lo, hi, max_leaf=4)
    tri_soa = pack_tri_soa(v, t[b.prim_indices])
    binned = pack_binned_scene(b, tri_soa)
    S = binned["slab_i"].shape[0] // CI
    assert S >= 8

    from ray_tpu.ops.traverse import _soa_from_arrays
    bvh_soa, tsoa = _soa_from_arrays(
        jnp.asarray(b.child_lo), jnp.asarray(b.child_hi),
        jnp.asarray(b.child), jnp.asarray(b.prim_indices),
        jnp.asarray(v), jnp.asarray(t),
    )

    R = 16384
    ro, rd, tmn, tmx, act = _rays(R, 11)
    stack = bvh_depth(b) + 4
    hx = traverse.trace_closest_soa(
        bvh_soa, tsoa, ro, rd, tmn, tmx, act,
        max_leaf=4, stack_size=stack, force_xla=True)
    hb = trace_flat_binned(binned, ro, rd, tmn, tmx, act, max_leaf=4)
    assert (np.asarray(hx.prim) >= 0).sum() > R // 10
    assert np.asarray(hb.prim).tolist() == np.asarray(hx.prim).tolist()
    np.testing.assert_allclose(np.asarray(hb.t), np.asarray(hx.t), rtol=1e-6)
    # occlusion verdicts agree
    ox = traverse.trace_occlusion_soa(
        bvh_soa, tsoa, ro, rd, tmn, tmx, act,
        max_leaf=4, stack_size=stack, force_xla=True)
    hb2 = trace_flat_binned(binned, ro, rd, tmn, tmx, act, max_leaf=4,
                            any_hit=True)
    np.testing.assert_array_equal(
        np.asarray(hb2.prim) >= 0, np.asarray(ox))
