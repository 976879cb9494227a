"""Tile-shape sweep on the big divergent scene (ROADMAP perf #1).

The traversal while-loop pays the slowest ray's trip count per tile; the
sweep finds the (nx, ny) grid that best trades divergence isolation
against per-call occupancy/overhead.  Run on the real TPU:

    python scripts/exp_tiles.py [nx ny [nx ny ...]]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from ray_tpu.render.integrator import PassSettings  # noqa: E402
from ray_tpu.utils.test_scenes import colonnade_scene  # noqa: E402


def main():
    args = [int(a) for a in sys.argv[1:]]
    grids = (list(zip(args[0::2], args[1::2])) if args
             else [(1, 12), (4, 3), (4, 6), (8, 6)])
    settings = PassSettings(max_total_depth=5, min_total_depth=2, remat=True)
    sc, cam = colonnade_scene()
    scene = sc.finalize()
    for grid in grids:
        mrays = bench.bench_scene(scene, cam, settings, iters=2, grid=grid)
        print(f"grid={grid[0]}x{grid[1]} "
              f"tile={bench.WIDTH // grid[0]}x{bench.HEIGHT // grid[1]} "
              f"-> {mrays:.3f} Mray/s fwd+bwd", flush=True)


if __name__ == "__main__":
    main()
