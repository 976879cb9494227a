"""Wide vs binary two-level TLAS traversal throughput on the real TPU.

Scene: grid of instanced spheres (one shared BLAS).  Usage:
python scripts/exp_wtlas.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ray_tpu.ops.traverse import _traverse_tlas, _traverse_wide_tlas
from ray_tpu.scene.scene import Scene
from ray_tpu.scene.materials import MaterialDesc, ShadingNode
from ray_tpu.scene.camera import make_camera, build_filter_table
from ray_tpu.render.raygen import generate_primary_rays
from ray_tpu.utils.geometry import make_uv_sphere


def timeit(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    grid = 7
    sc = Scene()
    sc.add_material(MaterialDesc(type=ShadingNode.DIFFUSE))
    v, idx, n, uv = make_uv_sphere(rings=24, segments=48)  # ~2.2k tris
    mesh = sc.add_mesh(v, idx, normals=n, uvs=uv)
    rng = np.random.default_rng(0)
    for i in range(grid):
        for j in range(grid):
            for k in range(grid):
                m = np.eye(4, dtype=np.float32)
                m[0, 0] = m[1, 1] = m[2, 2] = 0.6 + 0.6 * rng.random()
                m[:3, 3] = (np.array([i, j, k], np.float32)
                            - (grid - 1) / 2) * 2.5
                sc.add_instance(mesh, m)
    scene = sc.finalize(instancing="tlas")
    T_eff = scene.num_tris * grid ** 3
    print(f"blas tris={scene.num_tris} instances={grid**3} "
          f"effective={T_eff} stack={scene.stack_size} "
          f"wide={'wrows_tlas' in scene.bvh_soa}")

    R = 1 << 20
    W = H = 1024
    cam = make_camera(origin=(0, 0, -26), look_at=(0, 0, 0), fov=50.0)
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    rays = generate_primary_rays(
        cam, table, jnp.int32(0), jnp.int32(0), jnp.uint32(1), jnp.uint32(0),
        width=W, height=H, tile_w=W, tile_h=H, use_filter_table=False,
    )
    rng = np.random.default_rng(1)
    ro2 = jnp.asarray((rng.random((R, 3), np.float32) - 0.5) * 20)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    rd2 = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    t_min = jnp.zeros((R,), jnp.float32)
    t_max = jnp.full((R,), 1e30, jnp.float32)
    act = jnp.ones((R,), jnp.bool_)

    wide = jax.jit(lambda ro, rd: _traverse_wide_tlas(
        scene.bvh_soa, ro, rd, t_min, t_max, act, None,
        scene.max_leaf, scene.stack_size, any_hit=False))
    binary = jax.jit(lambda ro, rd: _traverse_tlas(
        scene.bvh_soa, scene.tri_soa, scene.inst, ro, rd, t_min, t_max, act,
        None, scene.max_leaf, scene.stack_size, any_hit=False))

    for name, fn in [("wide  ", wide), ("binary", binary)]:
        d1 = timeit(fn, rays.ro, rays.rd)
        d2 = timeit(fn, ro2, rd2)
        print(f"{name} primary {R/d1/1e6:7.2f} Mray/s | "
              f"random {R/d2/1e6:7.2f} Mray/s")

    hw = wide(rays.ro, rays.rd)
    hb = binary(rays.ro, rays.rd)
    same = np.asarray(hw.prim) == np.asarray(hb.prim)
    print("prim agreement:", same.mean())


if __name__ == "__main__":
    main()
