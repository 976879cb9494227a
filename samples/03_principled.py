"""Principled material showcase — samples/03_principled parity: a grid of
spheres sweeping metallic × roughness under an HDR-ish environment."""

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import ray_tpu
from ray_tpu.scene.materials import ShadingNode
from ray_tpu.utils.geometry import make_uv_sphere
from ray_tpu.utils.image_io import write_tga


def main(samples=32, size=256):
    sc = ray_tpu.Scene()
    v, idx, n, uv = make_uv_sphere(radius=0.45)
    grid = 4
    for i in range(grid):
        for j in range(grid):
            m = sc.add_material(ray_tpu.MaterialDesc(
                type=ShadingNode.PRINCIPLED,
                base_color=(0.7, 0.3, 0.2),
                metallic=i / (grid - 1),
                roughness=max(j / (grid - 1), 0.05),
            ))
            mesh = sc.add_mesh(v, idx, normals=n, uvs=uv, material=m)
            xf = np.eye(4, dtype=np.float32)
            xf[:3, 3] = [i * 1.1 - 1.65, j * 1.1 - 1.65, 0.0]
            sc.add_instance(mesh, xf)
    sc.set_environment((1.0, 1.0, 1.0))
    scene = sc.finalize(instancing="flatten")
    cam = ray_tpu.make_camera(origin=(0, 0, -6), look_at=(0, 0, 0), fov=45)
    r = ray_tpu.create_renderer(
        ray_tpu.RenderSettings(width=size, height=size),
        ray_tpu.PassSettings(max_total_depth=4),
    )
    r.render(scene, cam, samples=samples)
    write_tga("03_principled.tga", r.pixels(cam, ray_tpu.ViewTransform.AGX))
    print("wrote 03_principled.tga")


if __name__ == "__main__":
    main()
