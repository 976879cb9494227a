"""Leaf-size / SAH-cost experiment on the real TPU.

Measures wide-BVH trace throughput (primary rays + incoherent random rays)
on a big scene for (max_leaf, fat_leaves) variants.  Drives the ROADMAP
"SAH leaf-size cost tuning" decision.

Usage: python scripts/exp_leaf.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ray_tpu.ops.traverse import trace_closest_soa
from ray_tpu.scene.bvh import build_bvh2, bvh_depth, pack_tri_soa, tri_bounds
from ray_tpu.scene.scene import _bvh_soa_with_wide
from ray_tpu.scene.camera import make_camera
from ray_tpu.render.raygen import generate_primary_rays
from ray_tpu.utils.geometry import make_uv_sphere


def big_geometry(grid=6, rings=24, segments=48):
    """grid³ spheres → ~grid³·2·rings·segments tris."""
    verts, tris = [], []
    off = 0
    rng = np.random.default_rng(0)
    for i in range(grid):
        for j in range(grid):
            for k in range(grid):
                c = (np.array([i, j, k], np.float32) - (grid - 1) / 2) * 2.5
                r = 0.6 + 0.6 * rng.random()
                v, idx, n, uv = make_uv_sphere(center=c, radius=r,
                                               rings=rings, segments=segments)
                verts.append(v)
                tris.append(idx + off)
                off += v.shape[0]
    return np.concatenate(verts), np.concatenate(tris)


def timeit(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    vertices, tri_vidx = big_geometry()
    T = tri_vidx.shape[0]
    print(f"tris={T}")
    lo, hi = tri_bounds(vertices, tri_vidx)

    R = 1 << 20
    W, H = 1024, 1024
    cam = make_camera(origin=(0, 0, -26), look_at=(0, 0, 0), fov=50.0)
    from ray_tpu.scene.camera import build_filter_table
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    rays = generate_primary_rays(
        cam, table, jnp.int32(0), jnp.int32(0), jnp.uint32(1), jnp.uint32(0),
        width=W, height=H, tile_w=W, tile_h=H, use_filter_table=False,
    )
    # incoherent rays: random origins in the bbox, random dirs
    rng = np.random.default_rng(1)
    center, ext = (lo.min(0) + hi.max(0)) / 2, (hi.max(0) - lo.min(0))
    ro2 = jnp.asarray(
        center + (rng.random((R, 3), np.float32) - 0.5) * ext * 1.2
    )
    d = rng.normal(size=(R, 3)).astype(np.float32)
    rd2 = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))

    t_min = jnp.zeros((R,), jnp.float32)
    t_max = jnp.full((R,), 1e30, jnp.float32)
    active = jnp.ones((R,), jnp.bool_)

    ref_hit = None
    for max_leaf, fat in [(4, False), (4, True), (8, True)]:
        t0 = time.perf_counter()
        bvh = build_bvh2(lo, hi, max_leaf=max_leaf, fat_leaves=fat)
        tb = time.perf_counter() - t0
        tri_soa = pack_tri_soa(vertices, tri_vidx[bvh.prim_indices])
        soa = _bvh_soa_with_wide(bvh, tri_soa)
        soa = jax.tree_util.tree_map(jnp.asarray, soa)
        tri_soa = jax.tree_util.tree_map(jnp.asarray, tri_soa)
        ss = bvh_depth(bvh) + 4
        nn = soa["wrows"].shape[0]
        ng = soa["wrows"].shape[1]

        def tr(ro, rd):
            return trace_closest_soa(
                soa, tri_soa, ro, rd, t_min, t_max, active,
                max_leaf=max_leaf, stack_size=ss,
            )

        tr_j = jax.jit(tr)
        dt1 = timeit(tr_j, rays.ro, rays.rd)
        dt2 = timeit(tr_j, ro2, rd2)
        # correctness probe: primary hit t must match variant-to-variant
        h = tr_j(rays.ro, rays.rd)
        if ref_hit is None:
            ref_hit = h
        else:
            bad = int(jnp.sum(jnp.abs(h.t - ref_hit.t) > 1e-3))
            assert bad < 50, bad  # grazing/tie flips only
        print(
            f"max_leaf={max_leaf:2d} fat={int(fat)} build={tb:5.2f}s "
            f"wnodes={nn:6d} groups={ng:6d} depth={ss:2d} | "
            f"primary {R/dt1/1e6:7.2f} Mray/s | random {R/dt2/1e6:7.2f} Mray/s"
        )


if __name__ == "__main__":
    main()
