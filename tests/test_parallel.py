"""Multi-device sharding tests on the 8-way virtual CPU mesh.

The multi-host requirement (SURVEY.md §2.8): sharded renders must reproduce
single-device images bit-for-sample, and parameter gradients must all-reduce
correctly through the shard_map.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ray_tpu.parallel.shard import TILE_AXIS, make_tile_mesh, render_sharded
from ray_tpu.render.integrator import PassSettings, render_tile
from ray_tpu.scene.camera import build_filter_table
from ray_tpu.utils.test_scenes import cornell_scene

WIDTH, HEIGHT = 32, 32


@pytest.fixture(scope="module")
def setup():
    sc, cam = cornell_scene("emissive_quad")
    scene = sc.finalize()
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    settings = PassSettings(max_total_depth=3, min_total_depth=3)
    return scene, cam, table, settings


def test_sharded_matches_single_device(setup):
    scene, cam, table, settings = setup
    mesh = make_tile_mesh()
    assert mesh.devices.size == 8

    sharded = render_sharded(
        scene, cam, table, jnp.uint32(1), jnp.uint32(0),
        mesh=mesh, width=WIDTH, height=HEIGHT, settings=settings,
    )
    single = render_tile(
        scene, cam, table, jnp.int32(0), jnp.int32(0),
        jnp.uint32(1), jnp.uint32(0),
        width=WIDTH, height=HEIGHT, tile_w=WIDTH, tile_h=HEIGHT,
        settings=settings, use_filter_table=False,
    )
    np.testing.assert_array_equal(
        np.asarray(sharded["color"]), np.asarray(single["color"])
    )
    assert int(sharded["rays_traced"]) == int(single["rays_traced"])


def test_sharded_gradients_allreduce(setup):
    scene, cam, table, settings = setup
    mesh = make_tile_mesh()
    settings = dataclasses.replace(settings, remat=True)

    def loss_of(scene_, sharded: bool):
        if sharded:
            out = render_sharded(
                scene_, cam, table, jnp.uint32(1), jnp.uint32(0),
                mesh=mesh, width=WIDTH, height=HEIGHT, settings=settings,
            )
        else:
            out = render_tile(
                scene_, cam, table, jnp.int32(0), jnp.int32(0),
                jnp.uint32(1), jnp.uint32(0),
                width=WIDTH, height=HEIGHT, tile_w=WIDTH, tile_h=HEIGHT,
                settings=settings, use_filter_table=False,
            )
        return jnp.mean(out["color"] ** 2)

    def make_loss(sharded):
        def f(base_color):
            mats = dict(scene.materials)
            mats["base_color"] = base_color
            sc_ = dataclasses.replace(scene, materials=mats)
            return loss_of(sc_, sharded)
        return f

    bc = scene.materials["base_color"]
    g_sharded = jax.grad(make_loss(True))(bc)
    g_single = jax.grad(make_loss(False))(bc)
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_single), rtol=2e-4, atol=1e-6
    )
    assert np.abs(np.asarray(g_sharded)).max() > 0.0


def test_balanced_matches_sharded(setup):
    """Cross-chip ray re-balance (static all_to_all interleave) must be
    bit-exact vs plain band sharding: lanes are only RELOCATED between
    chips; per-lane math (RNG seeds from pixel coords, accumulation) is
    untouched (ROADMAP #10 / SURVEY §5 cross-chip re-balance)."""
    from ray_tpu.parallel.shard import render_sharded_balanced

    scene, cam, table, settings = setup
    mesh = make_tile_mesh()

    plain = render_sharded(
        scene, cam, table, jnp.uint32(1), jnp.uint32(0),
        mesh=mesh, width=WIDTH, height=HEIGHT, settings=settings,
    )
    balanced = render_sharded_balanced(
        scene, cam, table, jnp.uint32(1), jnp.uint32(0),
        mesh=mesh, width=WIDTH, height=HEIGHT, settings=settings,
    )
    for k in ("color", "base_color", "depth_normal"):
        np.testing.assert_array_equal(
            np.asarray(plain[k]), np.asarray(balanced[k]), err_msg=k
        )
    assert int(plain["rays_traced"]) == int(balanced["rays_traced"])
