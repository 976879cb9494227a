"""Forward vs forward+backward split on the flagship bench scene.

Quantifies where the fwd+bwd Mrays/s headline goes: pure forward render,
grad with remat (path replay), grad without remat (stored residuals).
"""

import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ray_tpu.render.integrator import PassSettings, render_tile
from ray_tpu.scene.camera import build_filter_table
from ray_tpu.utils.test_scenes import cornell_scene

W, H = 1920, 1080


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    sc, cam = cornell_scene("emissive_quad")
    scene = sc.finalize()
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    target = jnp.zeros((H * W, 3), jnp.float32)

    mat_float = {
        k: v for k, v in scene.materials.items()
        if jnp.issubdtype(v.dtype, jnp.floating)
    }
    params0 = {"materials": mat_float, "env_col": scene.env_col}

    def make_loss(remat):
        settings = PassSettings(max_total_depth=5, min_total_depth=2,
                                remat=remat)

        def loss_fn(params, iteration):
            merged = dict(scene.materials)
            merged.update(params["materials"])
            sc_ = dataclasses.replace(
                scene, materials=merged, env_col=params["env_col"]
            )
            out = render_tile(
                sc_, cam, table, jnp.int32(0), jnp.int32(0),
                iteration, jnp.uint32(0),
                width=W, height=H, tile_w=W, tile_h=H,
                settings=settings, use_filter_table=False,
            )
            return jnp.mean((out["color"] - target) ** 2), out["rays_traced"]

        return loss_fn

    loss_fn = make_loss(True)

    @jax.jit
    def fwd_only(params, it):
        return loss_fn(params, it)

    dt = timeit(fwd_only, params0, jnp.uint32(1))
    _, rays = fwd_only(params0, jnp.uint32(1))
    rays = int(rays)
    print(f"fwd only           {dt*1e3:8.1f} ms   {rays/dt/1e6:7.2f} Mray/s")

    @jax.jit
    def fwd_bwd_remat(params, it):
        (l, r), g = jax.value_and_grad(loss_fn, has_aux=True)(params, it)
        return l, r, g

    dt = timeit(fwd_bwd_remat, params0, jnp.uint32(1))
    print(f"fwd+bwd remat      {dt*1e3:8.1f} ms   {rays/dt/1e6:7.2f} Mray/s")

    loss2 = make_loss(False)

    @jax.jit
    def fwd_bwd_store(params, it):
        (l, r), g = jax.value_and_grad(loss2, has_aux=True)(params, it)
        return l, r, g

    try:
        dt = timeit(fwd_bwd_store, params0, jnp.uint32(1))
        print(f"fwd+bwd stored     {dt*1e3:8.1f} ms   {rays/dt/1e6:7.2f} Mray/s")
    except Exception as e:  # OOM expected at 1080p
        print(f"fwd+bwd stored     failed: {type(e).__name__}")


if __name__ == "__main__":
    main()
