"""NLM denoising of a low-spp render — samples/04_denoising parity."""

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import ray_tpu
from ray_tpu.render.tonemap import apply_view_transform
from ray_tpu.utils.image_io import write_tga
from ray_tpu.utils.test_scenes import cornell_scene


def main(samples=8, size=256):
    sc, cam = cornell_scene("emissive_quad")
    scene = sc.finalize()
    r = ray_tpu.create_renderer(
        ray_tpu.RenderSettings(width=size, height=size),
        ray_tpu.PassSettings(max_total_depth=4),
    )
    r.render(scene, cam, samples=samples)
    noisy = r.pixels(cam)
    den = np.asarray(apply_view_transform(r.denoise_image("nlm"), 0))
    write_tga("04_denoising_noisy.tga", noisy)
    write_tga("04_denoising.tga", den)
    print(f"wrote 04_denoising.tga ({samples} spp + joint NLM)")


if __name__ == "__main__":
    main()
