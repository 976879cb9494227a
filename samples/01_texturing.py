"""Textured floor + differentiable texture recovery — samples/01_texturing
parity plus the differentiable twist: recover a texture from a rendering
by gradient descent (the capability the reference cannot offer)."""

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import dataclasses
import jax, jax.numpy as jnp, numpy as np

import ray_tpu
from ray_tpu.render.integrator import PassSettings, render_tile
from ray_tpu.scene.camera import build_filter_table, make_camera
from ray_tpu.utils.geometry import make_quad
from ray_tpu.utils.image_io import write_tga


def build(tex_img):
    sc = ray_tpu.Scene()
    tex = sc.add_texture(tex_img, generate_mips=False)
    sc.add_material(ray_tpu.MaterialDesc(type=1, base_color=(1, 1, 1), base_texture=tex))
    v, idx, uv = make_quad((0, 0, 0), (0, 0, 1), (1, 0, 0))
    sc.add_mesh(v, idx, uvs=uv, material=0)
    sc.set_environment((1.0, 1.0, 1.0))
    return sc.finalize(), make_camera(origin=(0, 2.2, 0.01), look_at=(0, 0, 0), fov=50)


def main(steps=40, size=48):
    rng = np.random.default_rng(0)
    target_tex = rng.random((16, 16, 3)).astype(np.float32)
    scene_t, cam = build(target_tex)
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    settings = PassSettings(max_total_depth=2, min_total_depth=2)

    def render(scene):
        return render_tile(
            scene, cam, table, jnp.int32(0), jnp.int32(0), jnp.uint32(1),
            jnp.uint32(0), width=size, height=size, tile_w=size, tile_h=size,
            settings=settings, use_filter_table=False,
        )["color"]

    target = render(scene_t)
    scene0, _ = build(np.full((16, 16, 3), 0.5, np.float32))

    @jax.jit
    def step(texels):
        def loss(tx):
            s = dataclasses.replace(scene0, textures={**scene0.textures, "texels_t": tx})
            return jnp.mean((render(s) - target) ** 2)
        l, g = jax.value_and_grad(loss)(texels)
        return l, texels - 2.0 * g

    tx = scene0.textures["texels_t"]
    for i in range(steps):
        l, tx = step(tx)
        if i % 10 == 0:
            print(f"step {i}: loss {float(l):.6f}")
    write_tga("01_texturing.tga", np.asarray(render(
        dataclasses.replace(scene0, textures={**scene0.textures, "texels_t": tx})
    )).reshape(size, size, 3))
    print("wrote 01_texturing.tga")


if __name__ == "__main__":
    main()
