"""Per-stage timing on the real TPU: trace vs shade vs full pipeline.

Usage: python scripts/profile_stages.py [n_rays_log2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ray_tpu.ops.traverse import trace_closest_soa
from ray_tpu.render.integrator import PassSettings, render_tile
from ray_tpu.render.raygen import generate_primary_rays
from ray_tpu.scene.camera import build_filter_table
from ray_tpu.utils.test_scenes import cornell_scene


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    W, H = 1920, 1080
    R = W * H
    sc, cam = cornell_scene("emissive_quad")
    scene = sc.finalize()
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    print(f"tris={scene.num_tris} stack={scene.stack_size} R={R}")

    rays = generate_primary_rays(
        cam, table, jnp.int32(0), jnp.int32(0), jnp.uint32(1), jnp.uint32(0),
        width=W, height=H, tile_w=W, tile_h=H, use_filter_table=False,
    )
    active = jnp.ones((R,), jnp.bool_)
    t_min = jnp.zeros((R,), jnp.float32)

    @jax.jit
    def just_trace(ro, rd, t_max):
        return trace_closest_soa(
            scene.bvh_soa, scene.tri_soa, ro, rd, t_min, t_max, active,
            max_leaf=scene.max_leaf, stack_size=scene.stack_size,
        )

    dt = timeit(just_trace, rays.ro, rays.rd, rays.t_max)
    print(f"primary trace: {dt*1e3:8.2f} ms  -> {R/dt/1e6:8.2f} Mray/s")

    for depth in (1, 3, 5):
        settings = PassSettings(max_total_depth=depth, min_total_depth=depth)

        @jax.jit
        def full(it):
            return render_tile(
                scene, cam, table, jnp.int32(0), jnp.int32(0), it,
                jnp.uint32(0), width=W, height=H, tile_w=W, tile_h=H,
                settings=settings, use_filter_table=False,
            )["color"]

        dt = timeit(full, jnp.uint32(1), n=3)
        print(f"fwd depth={depth}: {dt*1e3:8.2f} ms")

    settings = PassSettings(max_total_depth=5, min_total_depth=2, remat=True)

    @jax.jit
    def fwdbwd(it):
        def loss(env_col):
            import dataclasses
            sc_ = dataclasses.replace(scene, env_col=env_col)
            out = render_tile(
                sc_, cam, table, jnp.int32(0), jnp.int32(0), it,
                jnp.uint32(0), width=W, height=H, tile_w=W, tile_h=H,
                settings=settings, use_filter_table=False,
            )
            return jnp.mean(out["color"] ** 2)
        return jax.grad(loss)(scene.env_col)

    dt = timeit(fwdbwd, jnp.uint32(1), n=3)
    print(f"fwd+bwd depth=5: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
