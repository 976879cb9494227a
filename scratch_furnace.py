import os, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
from ray_tpu.scene.materials import MaterialDesc, ShadingNode
from ray_tpu.utils.test_scenes import furnace_scene
from ray_tpu.render.renderer import Renderer, RenderSettings
from ray_tpu.render.integrator import PassSettings

sc, cam = furnace_scene(MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(1.0, 1.0, 1.0), roughness=0.0))
t0 = time.time()
flat = sc.finalize()
print("finalize", time.time() - t0, "tris", flat.num_tris)

r = Renderer(RenderSettings(64, 64), PassSettings(max_total_depth=3, min_total_depth=3))
t0 = time.time()
r.render_sample(flat, cam)
print("first sample (compile)", time.time() - t0)
t0 = time.time()
for _ in range(7):
    r.render_sample(flat, cam)
print("7 more samples", time.time() - t0)
img = r.radiance_image()
print("mean", img.mean(), "center mean", img[24:40, 24:40].mean())
print("corner (env) mean", img[:6, :6].mean())
