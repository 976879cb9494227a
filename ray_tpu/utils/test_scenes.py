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


def colonnade_scene(
    n_cols: int = 8,
    sphere_detail: int = 32,
    n_lights: int = 12,
    tex_res: int = 256,
    seed: int = 7,
):
    """Sponza-class benchmark scene (the reference's showcase budget class,
    README.md:24): an instanced colonnade hall with a dense displaced-terrain
    centerpiece — ≥200k instanced triangles, TLAS instancing, a procedural
    texture, and enough lights to engage the hierarchical light tree.

    Defaults: ~246k instanced tris over ~46k unique (64 column instances +
    16 terrain tiles), 12 sphere lights + env.
    """
    r = np.random.RandomState(seed)
    sc = Scene()

    # procedural checker/marble texture (floor + columns)
    yy, xx = np.meshgrid(np.arange(tex_res), np.arange(tex_res), indexing="ij")
    checker = (((xx // 16) + (yy // 16)) % 2).astype(np.float32)
    marble = 0.5 + 0.5 * np.sin(0.11 * xx + 4.0 * np.sin(0.07 * yy))
    tex = np.stack([0.25 + 0.55 * checker,
                    0.25 + 0.45 * marble,
                    0.35 + 0.35 * checker * marble], axis=-1).astype(np.float32)
    tex_id = sc.add_texture(tex, srgb=False)

    stone = sc.add_material(MaterialDesc(
        type=ShadingNode.PRINCIPLED, base_color=(0.75, 0.72, 0.68),
        base_texture=tex_id, roughness=0.55, specular=0.3))
    floor_m = sc.add_material(MaterialDesc(
        type=ShadingNode.PRINCIPLED, base_color=(0.5, 0.5, 0.55),
        base_texture=tex_id, roughness=0.25, specular=0.5))
    gold = sc.add_material(MaterialDesc(
        type=ShadingNode.PRINCIPLED, base_color=(0.9, 0.7, 0.3),
        metallic=1.0, roughness=0.3))

    # column: dense capsule-ish sphere stack (unique mesh, instanced)
    v, idx, n, uv = make_uv_sphere(radius=0.5, rings=sphere_detail,
                                   segments=2 * sphere_detail)
    v = v * np.array([1.0, 3.0, 1.0], np.float32)  # stretch into a column
    column = sc.add_mesh(v, idx, uvs=uv, material=stone)

    # dense displaced terrain tile (raw triangle mass)
    g = 48
    gy, gx = np.meshgrid(np.linspace(0, 1, g), np.linspace(0, 1, g),
                         indexing="ij")
    h = 0.15 * np.sin(9.0 * gx) * np.cos(7.0 * gy) + 0.05 * r.rand(g, g)
    tv = np.stack([gx * 4 - 2, h, gy * 4 - 2], axis=-1).reshape(-1, 3)
    quads = []
    for j in range(g - 1):
        for i in range(g - 1):
            a = j * g + i
            quads += [[a, a + 1, a + g], [a + 1, a + g + 1, a + g]]
    terrain = sc.add_mesh(tv.astype(np.float32), np.asarray(quads, np.int32),
                          uvs=np.stack([gx, gy], -1).reshape(-1, 2),
                          material=gold)

    fv, fidx, fuv = make_quad((0, 0, 0), (24, 0, 0), (0, 0, 24))
    floor = sc.add_mesh(fv, fidx, uvs=fuv, material=floor_m)

    def translate(t):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = t
        return m

    for j in range(n_cols):
        for i in range(n_cols):
            x = (i - (n_cols - 1) / 2) * 3.0
            z = (j - (n_cols - 1) / 2) * 3.0
            sc.add_instance(column, translate((x, 1.5, z)))
    for j in range(4):
        for i in range(4):
            sc.add_instance(
                terrain, translate(((i - 1.5) * 4.2, 0.02, (j - 1.5) * 4.2)))
    sc.add_instance(floor)

    for k in range(n_lights):
        sc.add_light(LightDesc(
            type=LightType.SPHERE,
            color=tuple(6.0 + 8.0 * r.rand(3)),
            position=((r.rand() - 0.5) * 20.0, 2.5 + 2.0 * r.rand(),
                      (r.rand() - 0.5) * 20.0),
            radius=0.15,
        ))
    sc.set_environment((0.12, 0.14, 0.18))
    cam = make_camera(origin=(9.0, 4.0, 9.5), look_at=(0.0, 1.0, 0.0),
                      fov=55.0)
    return sc, cam
