"""Transmittance-aware shadow rays (reference IntersectScene shadow loop,
CoreRef.cpp:3160-3262 + MATERIAL_SOLID_BIT, SceneCPU.cpp:470-499)."""

import numpy as np
import pytest

from ray_tpu.render.integrator import PassSettings
from ray_tpu.render.renderer import Renderer, RenderSettings
from ray_tpu.scene.camera import make_camera
from ray_tpu.scene.lights import LightDesc, LightType
from ray_tpu.scene.materials import MaterialDesc, ShadingNode
from ray_tpu.scene.scene import Scene
from ray_tpu.utils.geometry import make_quad

RES = 32


def _scene(panel_mat_fn):
    """White floor, small sphere light above, a panel between them."""
    sc = Scene()
    white = sc.add_material(
        MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0.8, 0.8, 0.8))
    )
    panel = panel_mat_fn(sc)
    fv, fi, fuv = make_quad((0, 0, 0), (2, 0, 0), (0, 0, -2))
    sc.add_mesh(fv, fi, uvs=fuv, material=white)
    pv, pi, puv = make_quad((0, 1.0, 0), (1.5, 0, 0), (0, 0, -1.5))
    sc.add_mesh(pv, pi, uvs=puv, material=panel)
    sc.add_light(
        LightDesc(type=LightType.SPHERE, color=(60, 60, 60),
                  position=(0, 2.0, 0), radius=0.05, visible=False)
    )
    cam = make_camera(origin=(0, 0.5, -3.0), look_at=(0, 0, 0), fov=35.0)
    return sc.finalize(), cam


def _floor_center(flat, cam, spp=16):
    r = Renderer(
        RenderSettings(RES, RES),
        PassSettings(max_total_depth=2, min_total_depth=2),
    )
    img = np.asarray(r.render(flat, cam, spp))
    c = RES // 2
    return img[c - 2 : c + 2, c - 2 : c + 2]


def test_transparent_panel_tints_shadow():
    solid, cam = _scene(lambda sc: sc.add_material(
        MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0.8, 0.8, 0.8))
    ))
    clear, _ = _scene(lambda sc: sc.add_material(
        MaterialDesc(type=ShadingNode.TRANSPARENT, base_color=(1, 1, 1))
    ))
    red, _ = _scene(lambda sc: sc.add_material(
        MaterialDesc(type=ShadingNode.TRANSPARENT, base_color=(1, 0.05, 0.05))
    ))
    assert not solid.has_transparency
    assert clear.has_transparency and red.has_transparency

    px_solid = _floor_center(solid, cam)
    px_clear = _floor_center(clear, cam)
    px_red = _floor_center(red, cam)

    # solid panel: floor center in shadow; clear panel: fully lit
    assert px_clear.mean() > 4.0 * max(px_solid.mean(), 1e-3)
    # tinted panel: red channel passes, green/blue blocked
    assert px_red[..., 0].mean() > 0.6 * px_clear[..., 0].mean()
    assert px_red[..., 1].mean() < 0.2 * px_red[..., 0].mean()


def test_mix_transparent_passes_weighted_fraction():
    """Mix(diffuse, transparent, 0.5) must pass ~half the light
    deterministically (CoreRef.cpp:3213-3250 weighted DAG expansion)."""
    def mixmat(sc):
        d = sc.add_material(
            MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0.8, 0.8, 0.8))
        )
        t = sc.add_material(
            MaterialDesc(type=ShadingNode.TRANSPARENT, base_color=(1, 1, 1))
        )
        return sc.add_material(
            MaterialDesc(type=ShadingNode.MIX, strength=0.5,
                         mix_materials=(d, t))
        )

    clear, cam = _scene(lambda sc: sc.add_material(
        MaterialDesc(type=ShadingNode.TRANSPARENT, base_color=(1, 1, 1))
    ))
    mixed, _ = _scene(mixmat)
    px_clear = _floor_center(clear, cam, spp=32)
    px_mix = _floor_center(mixed, cam, spp=32)
    ratio = px_mix.mean() / px_clear.mean()
    assert 0.4 < ratio < 0.65, ratio
