"""Micro-profile of the shade-stage components at wavefront scale."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ray_tpu.ops import rng
from ray_tpu.render import light_sampling, surface as surface_mod, uber
from ray_tpu.scene.camera import build_filter_table
from ray_tpu.render.raygen import generate_primary_rays
from ray_tpu.ops.traverse import trace_closest_soa
from ray_tpu.utils.test_scenes import cornell_scene


def timeit(fn, *args, n=10):
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
    rays = generate_primary_rays(
        cam, table, jnp.int32(0), jnp.int32(0), jnp.uint32(1), jnp.uint32(0),
        width=W, height=H, tile_w=W, tile_h=H, use_filter_table=False,
    )
    active = jnp.ones((R,), jnp.bool_)
    t_min = jnp.zeros((R,), jnp.float32)
    hit = jax.jit(lambda: trace_closest_soa(
        scene.bvh_soa, scene.tri_soa, rays.ro, rays.rd, t_min, rays.t_max,
        active, max_leaf=scene.max_leaf, stack_size=scene.stack_size))()
    jax.block_until_ready(hit)

    seed = rng.pixel_seed(rays.px, rays.py, jnp.uint32(0))
    si = jnp.uint32(0)

    def f_raygen():
        return generate_primary_rays(
            cam, table, jnp.int32(0), jnp.int32(0), jnp.uint32(1),
            jnp.uint32(0), width=W, height=H, tile_w=W, tile_h=H,
            use_filter_table=False,
        ).ro
    print(f"raygen           {timeit(jax.jit(f_raygen))*1e3:8.2f} ms")

    def f_rng():
        a, b = rng.scrambled_2d_rand(jnp.uint32(7), seed, si)
        return a + b
    print(f"rng 2d           {timeit(jax.jit(f_rng))*1e3:8.2f} ms")

    def f_surface():
        s = surface_mod.compute_surface(
            scene, hit.prim, hit.u, hit.v, hit.backface, rays.ro, rays.rd,
            hit.t)
        return s.P + s.N + s.T + s.B
    print(f"compute_surface  {timeit(jax.jit(f_surface))*1e3:8.2f} ms")

    surf = jax.jit(lambda: surface_mod.compute_surface(
        scene, hit.prim, hit.u, hit.v, hit.backface, rays.ro, rays.rd, hit.t))()
    mat_id = jax.jit(lambda: surface_mod.pick_hit_material(
        scene, hit.prim, hit.backface))()
    tex_rand = jnp.zeros((R, 2), jnp.float32)
    ext_ior = jnp.ones((R,), jnp.float32)

    def f_mix():
        m, a, b = surface_mod.resolve_mix(
            scene, mat_id, surf.uv, jnp.zeros((R,)), rays.rd, surf.N,
            ext_ior, hit.backface, tex_rand)
        return m
    print(f"resolve_mix      {timeit(jax.jit(f_mix))*1e3:8.2f} ms")

    def f_nmap():
        return surface_mod.apply_normal_map(
            scene, mat_id, surf, rays.rd, tex_rand).N
    print(f"apply_normal_map {timeit(jax.jit(f_nmap))*1e3:8.2f} ms")

    def f_params():
        p = uber.gather_uber_params(
            scene, mat_id, surf.uv, rays.rd, surf.N, hit.backface, ext_ior,
            tex_rand, regularize_alpha=0.0)
        return p.base_color
    print(f"gather_uber      {timeit(jax.jit(f_params))*1e3:8.2f} ms")

    params = jax.jit(lambda: uber.gather_uber_params(
        scene, mat_id, surf.uv, rays.rd, surf.N, hit.backface, ext_ior,
        tex_rand, regularize_alpha=0.0))()

    def f_ls():
        ls = light_sampling.sample_light_source(
            scene, surf.P, surf.T, surf.B, surf.N, jnp.zeros((R,)),
            tex_rand)
        return ls.col
    print(f"sample_light     {timeit(jax.jit(f_ls))*1e3:8.2f} ms")

    ls = jax.jit(lambda: light_sampling.sample_light_source(
        scene, surf.P, surf.T, surf.B, surf.N, jnp.zeros((R,)), tex_rand))()

    def f_eval():
        f, p = uber.eval_uber(params, surf.T, surf.B, surf.N, rays.rd, ls.L)
        return f
    print(f"eval_uber        {timeit(jax.jit(f_eval))*1e3:8.2f} ms")

    def f_sample():
        bs = uber.sample_uber(
            params, surf.T, surf.B, surf.N, rays.rd, tex_rand,
            jnp.zeros((R,)))
        return bs.dir
    print(f"sample_uber      {timeit(jax.jit(f_sample))*1e3:8.2f} ms")

    def f_env():
        return light_sampling.env_color(scene, rays.rd)
    print(f"env_color        {timeit(jax.jit(f_env))*1e3:8.2f} ms")

    def f_ial():
        return light_sampling.intersect_area_lights(
            scene, rays.ro, rays.rd, rays.t_max)[0]
    print(f"intersect_al     {timeit(jax.jit(f_ial))*1e3:8.2f} ms")

    # ior stack ops
    from ray_tpu.render.integrator import _push_ior, _pop_ior, _peek_ior
    stack = jnp.full((R, 4), -1.0, jnp.float32)

    def f_ior():
        s = _push_ior(stack, ext_ior, active)
        s = _pop_ior(s, active)
        return _peek_ior(s, hit.backface)
    print(f"ior ops          {timeit(jax.jit(f_ior))*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
