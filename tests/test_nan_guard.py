"""NaN-trap render mode (PassSettings.nan_check): per-bounce non-finite
live-lane state counting — the analogue of the reference running its test
battery with FP exceptions unmasked (tests/main.cpp:199-206)."""

import jax.numpy as jnp
import numpy as np

from ray_tpu.render.integrator import PassSettings, render_tile
from ray_tpu.scene.camera import build_filter_table
from ray_tpu.scene.materials import MaterialDesc, ShadingNode
from ray_tpu.utils.test_scenes import cornell_scene

RES = 24


def _render_nanchecked(flat, cam, **kw):
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    settings = PassSettings(
        max_total_depth=4, min_total_depth=4, nan_check=True, **kw
    )
    out = render_tile(
        flat, cam, table, jnp.int32(0), jnp.int32(0), jnp.int32(0),
        jnp.uint32(7), width=RES, height=RES, tile_w=RES, tile_h=RES,
        settings=settings, use_filter_table=True,
    )
    return out


def test_nan_check_clean_on_diffuse_scene():
    sc, cam = cornell_scene()
    out = _render_nanchecked(sc.finalize(), cam)
    assert "nonfinite" in out
    assert int(out["nonfinite"]) == 0
    assert np.isfinite(np.asarray(out["color"])).all()


def test_nan_check_clean_on_specular_glass_scene():
    # rough-specular + refractive box: exercises GGX sample/eval, IOR
    # stack and transparency continuations — the numerically risky paths
    sc, cam = cornell_scene(
        box_material=MaterialDesc(
            type=ShadingNode.REFRACTIVE, base_color=(1, 1, 1),
            roughness=0.05, ior=1.45,
        )
    )
    out = _render_nanchecked(sc.finalize(), cam)
    assert int(out["nonfinite"]) == 0
    assert np.isfinite(np.asarray(out["color"])).all()


def test_nan_check_with_occupancy_compaction():
    # the compact-tail branch returns (n_traced, nonfinite) sums through a
    # lax.cond — cover both flag states at R >= 1024 (32x32 tile)
    sc, cam = cornell_scene()
    flat = sc.finalize()
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    imgs = []
    for nan_check in (False, True):
        settings = PassSettings(
            max_total_depth=6, min_total_depth=2,
            compact_after=2, compact_factor=4, nan_check=nan_check,
        )
        out = render_tile(
            flat, cam, table, jnp.int32(0), jnp.int32(0), jnp.int32(0),
            jnp.uint32(3), width=32, height=32, tile_w=32, tile_h=32,
            settings=settings, use_filter_table=True,
        )
        if nan_check:
            assert int(out["nonfinite"]) == 0
        imgs.append(np.asarray(out["color"]))
    np.testing.assert_allclose(imgs[0], imgs[1], rtol=0, atol=0)
