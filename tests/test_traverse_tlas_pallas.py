"""Pallas TLAS kernel ↔ XLA wide-TLAS machine bit-equivalence.

Runs in interpreter mode on CPU (every suite run); the hardware pass in
tests/test_traverse_pallas.py covers compiled-on-TPU equivalence via
bench.py --tpu-tests.  The Pallas kernel must reproduce the XLA
``_traverse_wide_tlas`` exactly: same child ordering (argmin-first-tie),
same codes, same instance enter/restore ray rewrites.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ray_tpu.scene.materials import MaterialDesc, ShadingNode
from ray_tpu.scene.scene import Scene
from ray_tpu.utils.geometry import make_uv_sphere


def _instanced_scene(n_inst=6):
    sc = Scene()
    m = sc.add_material(MaterialDesc(type=ShadingNode.DIFFUSE,
                                     base_color=(0.7, 0.7, 0.7)))
    v, idx, n, uv = make_uv_sphere(radius=0.6, rings=12, segments=16)
    mesh = sc.add_mesh(v, idx, normals=n, uvs=uv, material=m)
    rng = np.random.default_rng(3)
    for i in range(n_inst):
        t = rng.uniform(-2.0, 2.0, 3)
        s = rng.uniform(0.5, 1.4)
        x = np.eye(4, dtype=np.float32)
        x[0, 0] = x[1, 1] = x[2, 2] = s
        x[:3, 3] = t
        sc.add_instance(mesh, x)
    sc.set_environment((0.5, 0.5, 0.5))
    return sc.finalize(instancing="tlas")


def _rays(R=512, seed=0):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-4, 4, (R, 3)).astype(np.float32)
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    t_min = np.zeros(R, np.float32)
    t_max = np.full(R, 1e30, np.float32)
    active = np.ones(R, bool)
    active[::17] = False
    return (jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(t_min),
            jnp.asarray(t_max), jnp.asarray(active))


@pytest.mark.parametrize("any_hit", [False, True])
def test_tlas_pallas_matches_xla(any_hit):
    scene = _instanced_scene()
    assert scene.mode == "tlas" and "wrows_tlas" in scene.bvh_soa
    ro, rd, t_min, t_max, active = _rays()

    from ray_tpu.ops import traverse
    from ray_tpu.ops.traverse_pallas import trace_tlas_pallas

    xla = traverse._traverse_wide_tlas(
        scene.bvh_soa, ro, rd, t_min, t_max, active, None,
        scene.max_leaf, scene.stack_size, any_hit=any_hit,
    )
    t, prim, u, v, bf, inst_row = trace_tlas_pallas(
        scene.bvh_soa, ro, rd, t_min, t_max, active, None,
        max_leaf=scene.max_leaf, stack_size=scene.stack_size,
        any_hit=any_hit, interpret=True,
    )
    if any_hit:
        # any-hit only promises occlusion agreement (first hit found
        # depends on traversal order, which IS mirrored — compare fully)
        np.testing.assert_array_equal(
            np.asarray(prim >= 0), np.asarray(xla.prim >= 0))
        return
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(xla.prim))
    # hit indices/flags exact; t/u/v to a few ULPs (interpreter evaluates
    # the same expressions with different fusion than the XLA machine)
    np.testing.assert_allclose(np.asarray(t), np.asarray(xla.t), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u), np.asarray(xla.u),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(xla.v),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(bf != 0), np.asarray(xla.backface))
    inst = jnp.where(prim >= 0, inst_row - scene.bvh_soa["winst_base"], -1)
    np.testing.assert_array_equal(np.asarray(inst), np.asarray(xla.inst))


def test_tlas_pallas_ray_mask():
    """Per-ray-type instance visibility must gate BLAS entry identically."""
    scene = _instanced_scene()
    ro, rd, t_min, t_max, active = _rays(R=256, seed=5)
    mask = jnp.asarray(
        (np.arange(256) % 3 == 0).astype(np.int32) * 0x7fffffff)

    from ray_tpu.ops import traverse
    from ray_tpu.ops.traverse_pallas import trace_tlas_pallas

    xla = traverse._traverse_wide_tlas(
        scene.bvh_soa, ro, rd, t_min, t_max, active, mask,
        scene.max_leaf, scene.stack_size, any_hit=False,
    )
    t, prim, u, v, bf, inst_row = trace_tlas_pallas(
        scene.bvh_soa, ro, rd, t_min, t_max, active, mask,
        max_leaf=scene.max_leaf, stack_size=scene.stack_size,
        any_hit=False, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(xla.prim))
    np.testing.assert_allclose(np.asarray(t), np.asarray(xla.t), rtol=1e-6)
