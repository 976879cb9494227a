import time
import numpy as np
from ray_tpu.utils.test_scenes import cornell_scene
from ray_tpu.render.renderer import Renderer, RenderSettings
from ray_tpu.render.integrator import PassSettings

for kind in ["emissive_quad", "rect", "sphere"]:
    sc, cam = cornell_scene(kind)
    flat = sc.finalize()
    # NEE on
    r1 = Renderer(RenderSettings(64, 64), PassSettings(max_total_depth=4, min_total_depth=4))
    t0 = time.time()
    r1.render_sample(flat, cam)
    dt_compile = time.time() - t0
    t0 = time.time()
    for i in range(63):
        r1.render_sample(flat, cam)
    dt = time.time() - t0
    img1 = r1.radiance_image()
    # NEE off (brute force) — only valid for emissive_quad (analytic lights
    # are invisible to BSDF rays until IntersectAreaLights lands)
    line = f"{kind}: mean={img1.mean():.4f} compile={dt_compile:.1f}s 63spp={dt:.2f}s"
    if kind == "emissive_quad":
        r2 = Renderer(RenderSettings(64, 64), PassSettings(max_total_depth=4, min_total_depth=4, use_nee=False))
        for i in range(256):
            r2.render_sample(flat, cam)
        img2 = r2.radiance_image()
        rel = abs(img1.mean() - img2.mean()) / img1.mean()
        line += f" | no-NEE mean={img2.mean():.4f} rel-diff={rel:.3%}"
    print(line)
