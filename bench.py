"""Benchmark: Mrays/s/chip forward+backward at 1080p 1spp (BASELINE.json).

Renders the Cornell-style flagship scene at 1920×1080, takes the gradient of
an L2 image loss w.r.t. the float material table + environment (path-replay
via remat), and reports actually-traced rays per second.  Prints exactly one
JSON line.
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

WIDTH, HEIGHT = 1920, 1080


def main():
    from ray_tpu.render.integrator import PassSettings, render_tile
    from ray_tpu.scene.camera import build_filter_table
    from ray_tpu.utils.test_scenes import cornell_scene

    sc, cam = cornell_scene("emissive_quad")
    scene = sc.finalize()
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    settings = PassSettings(max_total_depth=5, min_total_depth=2, remat=True)

    mat_float = {
        k: v for k, v in scene.materials.items()
        if jnp.issubdtype(v.dtype, jnp.floating)
    }
    params0 = {"materials": mat_float, "env_col": scene.env_col}
    target = jnp.zeros((HEIGHT * WIDTH, 3), jnp.float32)

    def loss_fn(params, iteration):
        merged = dict(scene.materials)
        merged.update(params["materials"])
        sc_ = dataclasses.replace(
            scene, materials=merged, env_col=params["env_col"]
        )
        out = render_tile(
            sc_, cam, table, jnp.int32(0), jnp.int32(0),
            iteration, jnp.uint32(0),
            width=WIDTH, height=HEIGHT, tile_w=WIDTH, tile_h=HEIGHT,
            settings=settings, use_filter_table=False,
        )
        return jnp.mean((out["color"] - target) ** 2), out["rays_traced"]

    @jax.jit
    def fwd_bwd(params, iteration):
        (loss, rays), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, iteration
        )
        return loss, rays, grads

    # warmup / compile
    loss, rays, grads = fwd_bwd(params0, jnp.uint32(1))
    jax.block_until_ready((loss, rays, grads))

    iters = 5
    t0 = time.perf_counter()
    total_rays = 0
    for i in range(iters):
        loss, rays, grads = fwd_bwd(params0, jnp.uint32(2 + i))
        jax.block_until_ready((loss, rays, grads))
        total_rays += int(rays)
    dt = time.perf_counter() - t0

    mrays = total_rays / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "Mrays/s/chip fwd+bwd 1080p 1spp",
                "value": round(mrays, 3),
                "unit": "Mray/s",
                "vs_baseline": 1.0,  # reference publishes no throughput numbers
            }
        )
    )


if __name__ == "__main__":
    main()
