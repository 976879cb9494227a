"""Big-scene (colonnade) per-config timing: where does the frame go and
what do occupancy compaction / NEE / depth contribute at the bench's tile
size.  Run on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ray_tpu.render.integrator import PassSettings, render_tile
from ray_tpu.scene.camera import build_filter_table
from ray_tpu.utils.test_scenes import colonnade_scene

W, H = 1920, 1080
NX, NY = 2, 2  # bench grid


def timeit(f, *args, n=3):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    sc, cam = colonnade_scene()
    scene = sc.finalize()
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    tw, th = W // NX, H // NY

    def run(tag, **kw):
        settings = PassSettings(**kw)

        @jax.jit
        def f(x0, y0, it):
            return render_tile(
                scene, cam, table, x0, y0, it, jnp.uint32(0),
                width=W, height=H, tile_w=tw, tile_h=th,
                settings=settings, use_filter_table=False,
            )["color"]

        # time all 4 tiles (the frame), report frame seconds
        def frame(it):
            outs = []
            for ty in range(NY):
                for tx in range(NX):
                    outs.append(f(jnp.int32(tx * tw), jnp.int32(ty * th), it))
            return outs

        dt = timeit(frame, jnp.uint32(1))
        print(f"{tag:46s} {dt:8.3f} s/frame")
        return dt

    base = dict(max_total_depth=5, min_total_depth=2, remat=True)
    run("bench baseline (depth5)", **base)
    run("compact after=1 factor=2", **base, compact_after=1,
        compact_factor=2)
    run("compact after=1 factor=4", **base, compact_after=1,
        compact_factor=4)
    run("compact after=2 factor=4", **base, compact_after=2,
        compact_factor=4)
    run("no NEE", **dict(base, use_nee=False))
    run("depth=1", max_total_depth=1, min_total_depth=1, remat=True)
    run("depth=0 (primary only)", max_total_depth=0, min_total_depth=0,
        remat=True)


if __name__ == "__main__":
    main()
