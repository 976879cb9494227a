#!/usr/bin/env python3
"""Render the committed CPU goldens (tests/goldens_cpu/*.npz) at high spp.

Run on any backend (TPU preferred for speed); the goldens are renderer
self-consistency anchors for the CPU unit suite (tests/test_cpu_goldens.py),
not reference-parity fixtures — reference parity is the hardware battery's
job (tests/test_golden.py).

    python scripts/gen_cpu_goldens.py [name ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from cpu_golden_scenes import GOLDEN_SPP, RES, SCENES, pass_settings  # noqa: E402


def main():
    names = sys.argv[1:] or list(SCENES)
    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests",
                           "goldens_cpu")
    os.makedirs(out_dir, exist_ok=True)
    from ray_tpu.render.renderer import Renderer, RenderSettings

    for name in names:
        sc, cam = SCENES[name]()
        scene = sc.finalize()
        r = Renderer(RenderSettings(width=RES, height=RES), pass_settings())
        t0 = time.time()
        r.render(scene, cam, GOLDEN_SPP)
        px = r.pixels(cam)
        u8 = np.clip(np.asarray(px) * 255.0, 0, 255).astype(np.uint8)
        np.savez_compressed(
            os.path.join(out_dir, f"{name}.npz"),
            image_u8=u8, spp=GOLDEN_SPP,
        )
        print(f"{name}: {time.time() - t0:.1f}s, mean {u8.mean():.2f}")


if __name__ == "__main__":
    main()
