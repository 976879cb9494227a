"""Isolate where the per-bounce time goes in the composed integrator."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ray_tpu.render.integrator import PassSettings, render_tile
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
    sc, cam = cornell_scene("emissive_quad")
    scene = sc.finalize()
    print("lights:", scene.num_lights, "tree depth:", scene.light_tree_depth)
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))

    def run(tag, **kw):
        settings = PassSettings(**kw)

        @jax.jit
        def f(it):
            return render_tile(
                scene, cam, table, jnp.int32(0), jnp.int32(0), it,
                jnp.uint32(0), width=W, height=H, tile_w=W, tile_h=H,
                settings=settings, use_filter_table=False,
            )["color"]

        dt = timeit(f, jnp.uint32(1))
        print(f"{tag:42s} {dt*1e3:8.2f} ms")

    run("depth=0 full", max_total_depth=0, min_total_depth=0)
    run("depth=0 no NEE", max_total_depth=0, min_total_depth=0, use_nee=False)
    run("depth=1 full", max_total_depth=1, min_total_depth=1)
    run("depth=1 no NEE", max_total_depth=1, min_total_depth=1, use_nee=False)
    run("depth=5 full", max_total_depth=5, min_total_depth=2)
    run("depth=5 no NEE", max_total_depth=5, min_total_depth=2, use_nee=False)


if __name__ == "__main__":
    main()
