"""Cornell-style box, diffuse + emissive ceiling light — the counterpart of
the reference's samples/00_basic/main.cpp: build a scene through the
public API, render progressively, write a TGA."""

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import ray_tpu
from ray_tpu.utils.image_io import write_tga
from ray_tpu.utils.test_scenes import cornell_scene


def main(samples=64, size=256, out="00_basic.tga"):
    sc, cam = cornell_scene("emissive_quad")
    scene = sc.finalize()
    r = ray_tpu.create_renderer(
        ray_tpu.RenderSettings(width=size, height=size),
        ray_tpu.PassSettings(max_total_depth=4),
        log=ray_tpu.LogStdout(),
    )
    r.render(scene, cam, samples=samples)
    write_tga(out, r.pixels(cam))
    print(f"wrote {out} ({samples} spp)")


if __name__ == "__main__":
    main(samples=int(sys.argv[1]) if len(sys.argv) > 1 else 64)
