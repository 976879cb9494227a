"""Native C++ BVH builder: invariants + traversal parity + speed."""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from ray_tpu.ops.traverse import trace_closest, trace_closest_brute
from ray_tpu.scene import native
from ray_tpu.scene.bvh import build_bvh2, bvh_depth, tri_bounds
from tests.test_bvh import _check_invariants, _random_rays, random_tri_soup

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no native toolchain"
)


def test_native_invariants_and_parity():
    v, t = random_tri_soup(3000, seed=11)
    lo, hi = tri_bounds(v, t)
    b = build_bvh2(lo, hi, max_leaf=4, use_native="always")
    _check_invariants(b, 3000)

    R = 256
    ro, rd = _random_rays(R, seed=12)
    t_min = jnp.zeros(R)
    t_max = jnp.full(R, 1e30)
    active = jnp.ones(R, bool)
    vj, tj = jnp.asarray(v), jnp.asarray(t)
    hit = trace_closest(
        jnp.asarray(b.child_lo), jnp.asarray(b.child_hi), jnp.asarray(b.child),
        jnp.asarray(b.prim_indices), vj, tj, ro, rd, t_min, t_max, active,
        max_leaf=b.max_leaf, stack_size=bvh_depth(b) + 4,
    )
    ref = trace_closest_brute(vj, tj, ro, rd, t_min, t_max, active)
    np.testing.assert_array_equal(
        np.asarray(hit.prim >= 0), np.asarray(ref.prim) >= 0
    )
    mask = np.asarray(ref.prim) >= 0
    np.testing.assert_allclose(
        np.asarray(hit.t)[mask], np.asarray(ref.t)[mask], rtol=1e-5
    )


def test_native_faster_than_numpy():
    v, t = random_tri_soup(60000, seed=13)
    lo, hi = tri_bounds(v, t)
    t0 = time.perf_counter()
    build_bvh2(lo, hi, max_leaf=4, use_native="always")
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    build_bvh2(lo, hi, max_leaf=4, use_native="never")
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy, (t_native, t_numpy)
