"""CPU (interpret-mode) semantics test of the binned flatten kernel —
the hardware bit-equivalence lives in test_traverse_pallas.py; this one
catches logic regressions without a chip."""

import numpy as np


def test_binned_interpret_matches_xla():
    import jax.numpy as jnp

    from ray_tpu.ops import traverse
    from ray_tpu.ops.traverse import _soa_from_arrays
    from ray_tpu.ops.traverse_pallas import (
        CI, pack_binned_scene, trace_flat_binned,
    )
    from ray_tpu.scene.bvh import build_bvh2, bvh_depth, pack_tri_soa, tri_bounds

    r = np.random.RandomState(3)
    n_tris = 3000
    base = r.rand(n_tris, 1, 3).astype(np.float32) * 10.0
    tris = base + r.rand(n_tris, 3, 3).astype(np.float32) * 0.6
    v = tris.reshape(-1, 3)
    t = np.arange(3 * n_tris, dtype=np.int32).reshape(n_tris, 3)
    lo, hi = tri_bounds(v, t)
    b = build_bvh2(lo, hi, max_leaf=4, use_native="never")
    tri_soa = pack_tri_soa(v, t[b.prim_indices])
    binned = pack_binned_scene(b, tri_soa)
    assert binned["slab_i"].shape[0] // CI >= 4

    R = 1024
    ro = jnp.asarray((r.rand(R, 3).astype(np.float32) * 30 - 10))
    tgt = jnp.asarray(r.rand(R, 3).astype(np.float32) * 10)
    rd = tgt - ro
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    tmn = jnp.zeros((R,))
    tmx = jnp.full((R,), 1e30, jnp.float32)
    act = jnp.asarray(r.rand(R) > 0.05)

    bvh_soa, tsoa = _soa_from_arrays(
        jnp.asarray(b.child_lo), jnp.asarray(b.child_hi),
        jnp.asarray(b.child), jnp.asarray(b.prim_indices),
        jnp.asarray(v), jnp.asarray(t),
    )
    hx = traverse.trace_closest_soa(
        bvh_soa, tsoa, ro, rd, tmn, tmx, act,
        max_leaf=4, stack_size=bvh_depth(b) + 4, force_xla=True)
    hb = trace_flat_binned(binned, ro, rd, tmn, tmx, act, max_leaf=4,
                           interpret=True)
    assert (np.asarray(hx.prim) >= 0).mean() > 0.3
    assert np.asarray(hb.prim).tolist() == np.asarray(hx.prim).tolist()
    np.testing.assert_allclose(np.asarray(hb.t), np.asarray(hx.t), rtol=1e-6)
