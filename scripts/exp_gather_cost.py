"""Microbench: what do colonnade-scale shade-stage memory patterns cost on
the chip?  XLA gather vs one-hot matmul at several table sizes, plus the
composed stages (compute_surface / gather_uber / sample_light) on the real
colonnade scene at wavefront scale."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, n=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    R = 518_400  # bench tile (960x540)
    rng = np.random.default_rng(0)

    for M, C in ((128, 40), (1024, 40), (8400, 40), (8400, 8),
                 (330_000, 8), (1_000_000, 4)):
        table = jnp.asarray(rng.random((M, C), np.float32))
        idx = jnp.asarray(rng.integers(0, M, R, dtype=np.int32))

        f = jax.jit(lambda t, i: t[i])
        dt = timeit(f, table, idx)
        print(f"gather   ({M:>8}x{C:2d} <- {R}): {dt*1e3:7.2f} ms "
              f"({R*C*4/dt/1e9:6.1f} GB/s eff)")

    # gather with backward (the remat replay pays this too)
    table = jnp.asarray(rng.random((8400, 40), np.float32))
    idx = jnp.asarray(rng.integers(0, 8400, R, dtype=np.int32))
    g = jax.jit(jax.grad(lambda t: jnp.sum(t[idx] * 0.5)))
    print(f"gather+scatter-bwd (8400x40): {timeit(g, table)*1e3:7.2f} ms")

    # composed real stages on the colonnade
    from ray_tpu.ops.traverse import trace_closest_tlas
    from ray_tpu.render import surface as surface_mod, uber, light_sampling
    from ray_tpu.render.raygen import generate_primary_rays
    from ray_tpu.scene.camera import build_filter_table
    from ray_tpu.utils.test_scenes import colonnade_scene

    sc, cam = colonnade_scene()
    scene = sc.finalize()
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    W, H, tw, th = 1920, 1080, 960, 540
    rays = generate_primary_rays(
        cam, table, jnp.int32(0), jnp.int32(0), jnp.uint32(1), jnp.uint32(0),
        width=W, height=H, tile_w=tw, tile_h=th, use_filter_table=False,
    )
    active = jnp.ones((R,), jnp.bool_)
    t_min = jnp.zeros((R,), jnp.float32)
    hit = jax.jit(lambda: trace_closest_tlas(
        scene.bvh_soa, scene.tri_soa, scene.inst, rays.ro, rays.rd,
        t_min, rays.t_max, active, max_leaf=scene.max_leaf,
        stack_size=scene.stack_size))()
    jax.block_until_ready(hit)
    print("hit rate:", float(jnp.mean((hit.prim >= 0).astype(jnp.float32))))

    def f_surf():
        s = surface_mod.compute_surface(
            scene, hit.prim, hit.u, hit.v, hit.backface, rays.ro, rays.rd,
            hit.t, inst=hit.inst)
        return s.P + s.N
    print(f"compute_surface: {timeit(jax.jit(f_surf))*1e3:7.2f} ms")

    surf = jax.jit(lambda: surface_mod.compute_surface(
        scene, hit.prim, hit.u, hit.v, hit.backface, rays.ro, rays.rd,
        hit.t, inst=hit.inst))()
    mat_id = jax.jit(lambda: surface_mod.pick_hit_material(
        scene, hit.prim, hit.backface))()
    tex_rand = jnp.zeros((R, 2), jnp.float32)
    ext_ior = jnp.ones((R,), jnp.float32)
    lam = jnp.zeros((R,), jnp.float32)

    def f_params():
        p = uber.gather_uber_params(
            scene, mat_id, surf.uv, rays.rd, surf.N, hit.backface, ext_ior,
            tex_rand, regularize_alpha=0.0, lam=lam)
        return p.base_color
    print(f"gather_uber    : {timeit(jax.jit(f_params))*1e3:7.2f} ms")

    def f_ls():
        ls = light_sampling.sample_light_source(
            scene, surf.P, surf.T, surf.B, surf.N,
            jnp.zeros((R,)), tex_rand)
        return ls.col
    print(f"sample_light   : {timeit(jax.jit(f_ls))*1e3:7.2f} ms")

    params = jax.jit(lambda: uber.gather_uber_params(
        scene, mat_id, surf.uv, rays.rd, surf.N, hit.backface, ext_ior,
        tex_rand, regularize_alpha=0.0, lam=lam))()
    ls = jax.jit(lambda: light_sampling.sample_light_source(
        scene, surf.P, surf.T, surf.B, surf.N, jnp.zeros((R,)), tex_rand))()

    def f_eval():
        f, p = uber.eval_uber(params, surf.T, surf.B, surf.N, rays.rd, ls.L)
        return f
    print(f"eval_uber      : {timeit(jax.jit(f_eval))*1e3:7.2f} ms")

    def f_sample():
        bs = uber.sample_uber(params, surf.T, surf.B, surf.N, rays.rd,
                              tex_rand, jnp.zeros((R,)))
        return bs.dir
    print(f"sample_uber    : {timeit(jax.jit(f_sample))*1e3:7.2f} ms")

    def f_ial():
        return light_sampling.intersect_area_lights(
            scene, rays.ro, rays.rd, rays.t_max)[0]
    print(f"intersect_al   : {timeit(jax.jit(f_ial))*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
