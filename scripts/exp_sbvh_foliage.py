#!/usr/bin/env python3
"""SBVH on the scene class it exists for (VERDICT r3 #7).

Spatial splits pay off on long, thin, DIAGONAL triangles whose AABBs
overlap heavily (reference BVHSplit.h:20); the colonnade's compact
columns measured neutral.  This generates a foliage/trellis field —
thousands of long thin blades at random orientations — and measures
closest-hit trace time with and without spatial splits.

    python scripts/exp_sbvh_foliage.py [n_blades]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_blades(n, rng):
    """n long thin diagonal blades: length ~1.5, width ~0.01, random
    orientation in a 10x10x10 box — worst-case AABB overlap."""
    p0 = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    L = rng.uniform(1.0, 2.0, (n, 1)).astype(np.float32)
    w = rng.normal(size=(n, 3)).astype(np.float32)
    w -= (w * d).sum(1, keepdims=True) * d
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    w *= 0.01
    p1 = p0 + d * L
    p2 = p0 + w
    verts = np.concatenate([p0, p1, p2], axis=0)
    idx = np.stack([np.arange(n), np.arange(n) + n, np.arange(n) + 2 * n],
                   axis=1).astype(np.int32)
    return verts, idx


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    rng = np.random.default_rng(0)
    verts, idx = make_blades(n, rng)

    import jax
    import jax.numpy as jnp

    from ray_tpu.scene.materials import MaterialDesc, ShadingNode
    from ray_tpu.scene.scene import Scene
    from ray_tpu.ops.traverse import trace_closest_soa

    R = 512 * 512
    ro = jnp.asarray(rng.uniform(-6, 6, (R, 3)).astype(np.float32))
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rd = jnp.asarray(rd)
    tmin = jnp.zeros((R,), jnp.float32)
    tmax = jnp.full((R,), 1e30, jnp.float32)
    act = jnp.ones((R,), bool)

    for label, splits in (("plain SAH", False), ("SBVH", True)):
        sc = Scene()
        m = sc.add_material(MaterialDesc(type=ShadingNode.DIFFUSE))
        sc.add_mesh(verts, idx, material=m)
        t0 = time.time()
        scene = sc.finalize(spatial_splits=splits)
        t_build = time.time() - t0

        f = jax.jit(lambda: trace_closest_soa(
            scene.bvh_soa, scene.tri_soa, ro, rd, tmin, tmax, act,
            max_leaf=scene.max_leaf, stack_size=scene.stack_size))
        out = f()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = f()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        hits = int(np.asarray(out.prim >= 0).sum())
        print(f"{label:9s}: build {t_build:6.2f}s  trace {R/dt/1e6:7.2f} "
              f"Mray/s  ({hits} hits)")


if __name__ == "__main__":
    main()
