"""Canonical test scenes (the analogue of the reference's ``setup_test_scene``
battery, tests/test_scene.cpp): furnace spheres, Cornell-style boxes with
each light type, material-ball variants."""

from __future__ import annotations

import numpy as np

from ray_tpu.scene.camera import make_camera
from ray_tpu.scene.lights import LightDesc, LightType
from ray_tpu.scene.materials import MaterialDesc, ShadingNode
from ray_tpu.scene.scene import Scene
from ray_tpu.utils.geometry import make_box, make_quad, make_uv_sphere


def furnace_scene(material: MaterialDesc, env=(1.0, 1.0, 1.0), radius=1.0):
    """A single sphere in a constant environment — the classic furnace
    test.  For a *convex* diffuse body L_out = albedo × L_env exactly."""
    sc = Scene()
    mat = sc.add_material(material)
    v, idx, n, uv = make_uv_sphere(radius=radius)
    sc.add_mesh(v, idx, normals=n, uvs=uv, material=mat)
    sc.set_environment(env)
    cam = make_camera(origin=(0, 0, -4), look_at=(0, 0, 0), fov=40.0)
    return sc, cam


def cornell_scene(
    light_kind: str = "emissive_quad",
    box_material: MaterialDesc | None = None,
    light_power: float = 20.0,
):
    """Cornell-style box: white back/floor/ceiling, red left, green right,
    a diffuse tall box, and a configurable light source."""
    sc = Scene()
    white = sc.add_material(MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0.73, 0.73, 0.73), roughness=0.0))
    red = sc.add_material(MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0.65, 0.05, 0.05), roughness=0.0))
    green = sc.add_material(MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0.12, 0.45, 0.15), roughness=0.0))
    if box_material is None:
        box_material = MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0.73, 0.73, 0.73), roughness=0.0)
    boxmat = sc.add_material(box_material)

    s = 1.0  # half size
    # floor (+Y normal), ceiling (-Y), back (+Z->-Z), left, right
    for center, u, v, m in [
        ((0, -s, 0), (s, 0, 0), (0, 0, s), white),     # floor
        ((0, +s, 0), (s, 0, 0), (0, 0, -s), white),    # ceiling
        ((0, 0, +s), (s, 0, 0), (0, -s, 0), white),    # back wall (faces -z)
        ((-s, 0, 0), (0, 0, s), (0, -s, 0), red),      # left wall faces +x
        ((+s, 0, 0), (0, 0, -s), (0, -s, 0), green),   # right wall faces -x
    ]:
        verts, idx, uvs = make_quad(center, u, v)
        sc.add_mesh(verts, idx, uvs=uvs, material=m)

    bv, bidx, bn = make_box(center=(-0.3, -0.65, 0.3), size=(0.6, 0.7, 0.6))
    sc.add_mesh(bv, bidx, normals=bn, material=boxmat)

    if light_kind == "emissive_quad":
        emis = sc.add_material(
            MaterialDesc(
                type=ShadingNode.EMISSIVE,
                base_color=(1.0, 1.0, 1.0),
                strength=light_power,
                importance_sample=True,
            )
        )
        # wound so the emitting face (cross(u, v)) points down into the box
        lv, lidx, luv = make_quad((0, s - 0.001, 0), (0.25, 0, 0), (0, 0, 0.25))
        sc.add_mesh(lv, lidx, uvs=luv, material=emis)
    elif light_kind == "rect":
        sc.add_light(
            LightDesc(
                type=LightType.RECT,
                color=(light_power, light_power, light_power),
                position=(0, s - 0.001, 0),
                axis_u=(1.0, 0.0, 0.0),
                axis_v=(0.0, 0.0, 1.0),
                width=0.5,
                height=0.5,
            )
        )
    elif light_kind == "sphere":
        sc.add_light(
            LightDesc(
                type=LightType.SPHERE,
                color=(light_power, light_power, light_power),
                position=(0, 0.6, 0),
                radius=0.12,
            )
        )
    elif light_kind == "dir":
        # directional "sun": color is radiance, so a few-degree disk needs
        # a high value to light the box (solid angle ≈ π·tan²(angle/2))
        sc.add_light(
            LightDesc(
                type=LightType.DIR,
                color=(light_power * 25.0,) * 3,
                direction=(0.2, -1.0, 1.6),  # shines in through the open front
                angle=4.0,
            )
        )
    elif light_kind == "env":
        sc.set_environment((0.5, 0.6, 0.7))
    else:
        raise ValueError(light_kind)

    cam = make_camera(origin=(0, 0, -2.9), look_at=(0, 0, 0), fov=45.0)
    return sc, cam
