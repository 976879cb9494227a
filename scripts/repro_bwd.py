"""Repro the r04 flagship fwd+bwd collapse on the chip.

Times fwd and fwd+bwd on the Cornell flagship at bench settings, with
knobs to isolate the cause: --force-xla, --no-save-trace, --no-remat,
--res WxH.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from ray_tpu.render.integrator import PassSettings, render_tile
    from ray_tpu.scene.camera import build_filter_table
    from ray_tpu.utils.test_scenes import cornell_scene

    W, H = 1920, 1080
    for a in sys.argv[1:]:
        if a.startswith("--res="):
            W, H = map(int, a.split("=")[1].split("x"))
    force_xla = "--force-xla" in sys.argv
    save_trace = "--no-save-trace" not in sys.argv
    remat = "--no-remat" not in sys.argv

    settings = PassSettings(
        max_total_depth=5, min_total_depth=2, remat=remat,
        remat_save_trace=save_trace, force_xla=force_xla,
    )
    sc, cam = cornell_scene("emissive_quad")
    scene = sc.finalize()
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    mat_float = {
        k: v for k, v in scene.materials.items()
        if jnp.issubdtype(v.dtype, jnp.floating)
    }
    params0 = {"materials": mat_float, "env_col": scene.env_col}
    target = jnp.zeros((H * W, 3), jnp.float32)

    def loss_fn(params, iteration):
        merged = dict(scene.materials)
        merged.update(params["materials"])
        sc_ = dataclasses.replace(
            scene, materials=merged, env_col=params["env_col"]
        )
        out = render_tile(
            sc_, cam, table, jnp.int32(0), jnp.int32(0), iteration,
            jnp.uint32(0), width=W, height=H, tile_w=W, tile_h=H,
            settings=settings, use_filter_table=False,
        )
        loss = jnp.sum((out["color"] - target) ** 2) / (H * W * 3)
        return loss, out["rays_traced"]

    fwd_bwd = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    fwd_only = jax.jit(loss_fn)

    def timed(fn, label, iters=3):
        t0 = time.perf_counter()
        out = fn(params0, jnp.uint32(1))
        jax.block_until_ready(out)
        print(f"{label} compile+1st: {time.perf_counter()-t0:.2f}s")
        t0 = time.perf_counter()
        rays = 0
        for i in range(iters):
            out = fn(params0, jnp.uint32(2 + i))
            if isinstance(out[0], tuple):
                rays += int(out[0][1])
            else:
                rays += int(out[1])
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"{label}: {dt/iters*1e3:.1f} ms/frame, "
              f"{rays/dt/1e6:.2f} Mray/s")
        return dt / iters

    print(f"devices={jax.devices()} res={W}x{H} force_xla={force_xla} "
          f"save_trace={save_trace} remat={remat}")
    tf = timed(fwd_only, "fwd     ")
    tb = timed(fwd_bwd, "fwd+bwd ")
    print(f"ratio fwd+bwd/fwd: {tb/tf:.2f}")


if __name__ == "__main__":
    main()
