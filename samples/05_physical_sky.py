"""Procedural physical sky with sun, clouds, moon and stars —
samples/05_physical_sky parity (reference bakes Bruneton-style LUT sky;
ours additionally exposes the celestial bodies and is differentiable)."""

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import ray_tpu
from ray_tpu.scene.materials import ShadingNode
from ray_tpu.utils.geometry import make_quad
from ray_tpu.utils.image_io import write_tga


def main(samples=16, size=256, sun_elevation=8.0):
    sc = ray_tpu.Scene()
    sc.add_material(ray_tpu.MaterialDesc(
        type=ShadingNode.DIFFUSE, base_color=(0.35, 0.3, 0.25)))
    v, idx, uv = make_quad((0, 0, 0), (0, 0, 60), (60, 0, 0))
    sc.add_mesh(v, idx, uvs=uv, material=0)
    el = np.radians(sun_elevation)
    sc.set_physical_sky(
        sun_direction=(np.cos(el), np.sin(el), 0.15),
        sun_color=(30.0, 30.0, 30.0),
        full_sky=True, cloud_steps=10,
    )
    scene = sc.finalize()
    cam = ray_tpu.make_camera(origin=(0, 1.5, -4), look_at=(8, 3.5, 0), fov=60)
    r = ray_tpu.create_renderer(
        ray_tpu.RenderSettings(width=size, height=size),
        ray_tpu.PassSettings(max_total_depth=3),
    )
    r.render(scene, cam, samples=samples)
    write_tga("05_physical_sky.tga", r.pixels(cam, ray_tpu.ViewTransform.AGX))
    print("wrote 05_physical_sky.tga")


if __name__ == "__main__":
    main()
