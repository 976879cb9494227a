"""Per-material furnace tests — the analytic analogue of the reference's
per-BSDF golden battery (tests/main.cpp:27-118, oren/diff/glossy/spec/metal/
refr/trans...).

A convex body in a constant unit environment must return:
* diffuse/glossy/transparent/glass with albedo 1 → exactly 1 (energy
  conservation; small loss allowed for truncation & single-scatter GGX),
* never > 1 (no energy gain).
"""

import numpy as np
import pytest

from ray_tpu.render.integrator import PassSettings
from ray_tpu.render.renderer import Renderer, RenderSettings
from ray_tpu.scene.materials import MaterialDesc, ShadingNode
from ray_tpu.utils.test_scenes import furnace_scene

RES = 24


def _furnace_value(mat, spp=24, depth=8):
    sc, cam = furnace_scene(mat)
    flat = sc.finalize()
    r = Renderer(
        RenderSettings(RES, RES),
        PassSettings(
            max_total_depth=depth,
            min_total_depth=depth,
            max_spec_depth=depth,
            max_refr_depth=depth,
            max_transp_depth=depth,
            use_path_termination=False,
        ),
    )
    img = r.render(flat, cam, spp)
    c = RES // 2
    return float(img[c - 3 : c + 3, c - 3 : c + 3].mean())


def test_glossy_mirror_furnace():
    v = _furnace_value(
        MaterialDesc(type=ShadingNode.GLOSSY, base_color=(1, 1, 1), roughness=0.0)
    )
    assert abs(v - 1.0) < 0.02, v


def test_glossy_rough_furnace():
    # single-scattering Smith GGX loses some energy at roughness 0.5
    v = _furnace_value(
        MaterialDesc(type=ShadingNode.GLOSSY, base_color=(1, 1, 1), roughness=0.5)
    )
    assert 0.8 < v <= 1.02, v


def test_transparent_furnace():
    v = _furnace_value(
        MaterialDesc(type=ShadingNode.TRANSPARENT, base_color=(1, 1, 1))
    )
    assert abs(v - 1.0) < 0.02, v


def test_glass_furnace():
    # clear glass ball: refraction+reflection shuffle directions but conserve
    # energy; depth truncation through multiple TIR bounces loses a little
    v = _furnace_value(
        MaterialDesc(
            type=ShadingNode.REFRACTIVE, base_color=(1, 1, 1), roughness=0.0,
            ior=1.45,
        ),
        depth=12,
    )
    assert 0.85 < v <= 1.03, v


def test_principled_default_furnace():
    v = _furnace_value(
        MaterialDesc(type=ShadingNode.PRINCIPLED, base_color=(1, 1, 1),
                     roughness=0.5, specular=0.5)
    )
    assert 0.75 < v <= 1.03, v


def test_principled_metal_furnace():
    v = _furnace_value(
        MaterialDesc(type=ShadingNode.PRINCIPLED, base_color=(1, 1, 1),
                     metallic=1.0, roughness=0.3)
    )
    assert 0.8 < v <= 1.02, v


def test_principled_clearcoat_runs():
    v = _furnace_value(
        MaterialDesc(type=ShadingNode.PRINCIPLED, base_color=(0.8, 0.2, 0.2),
                     clearcoat=1.0, clearcoat_roughness=0.1, roughness=0.4)
    )
    assert 0.0 < v <= 1.05, v


def test_principled_transmission_furnace():
    v = _furnace_value(
        MaterialDesc(type=ShadingNode.PRINCIPLED, base_color=(1, 1, 1),
                     transmission=1.0, roughness=0.0, ior=1.45),
        depth=12,
    )
    assert 0.8 < v <= 1.03, v


def test_emissive_sphere():
    sc, cam = furnace_scene(
        MaterialDesc(type=ShadingNode.EMISSIVE, base_color=(1.0, 0.5, 0.25),
                     strength=2.0),
        env=(0.0, 0.0, 0.0),
    )
    flat = sc.finalize()
    r = Renderer(RenderSettings(RES, RES), PassSettings(max_total_depth=2))
    img = r.render(flat, cam, 4)
    c = RES // 2
    got = img[c - 3 : c + 3, c - 3 : c + 3].mean(axis=(0, 1))
    np.testing.assert_allclose(got, [2.0, 1.0, 0.5], rtol=1e-3)


def test_mix_material():
    """50/50 mix of red diffuse and green diffuse ≈ yellow-ish furnace."""
    from ray_tpu.scene.scene import Scene
    from ray_tpu.scene.camera import make_camera
    from ray_tpu.utils.geometry import make_uv_sphere

    sc = Scene()
    red = sc.add_material(
        MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(1, 0, 0), roughness=0)
    )
    green = sc.add_material(
        MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0, 1, 0), roughness=0)
    )
    mix = sc.add_material(
        MaterialDesc(
            type=ShadingNode.MIX, mix_materials=(red, green), strength=0.5,
            ior=0.0,  # no fresnel weighting
        )
    )
    v, idx, n, uv = make_uv_sphere()
    sc.add_mesh(v, idx, normals=n, uvs=uv, material=mix)
    sc.set_environment((1.0, 1.0, 1.0))
    cam = make_camera(origin=(0, 0, -4), look_at=(0, 0, 0), fov=40.0)
    flat = sc.finalize()
    r = Renderer(RenderSettings(RES, RES), PassSettings(max_total_depth=3, min_total_depth=3))
    img = r.render(flat, cam, 64)
    c = RES // 2
    got = img[c - 3 : c + 3, c - 3 : c + 3].mean(axis=(0, 1))
    np.testing.assert_allclose(got, [0.5, 0.5, 0.0], atol=0.06)
