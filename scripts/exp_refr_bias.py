"""Isolate bias vs variance in refr_mis0: render the golden scene at high
spp with ray_tpu and diff against the converged reference golden in the
penumbra ring around the refracted disc-light spot."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    import json

    from golden_scene import build_scene
    from ray_tpu.render.renderer import Renderer, RenderSettings
    from ray_tpu.utils.image_io import read_tga

    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 144
    m = json.load(open("tests/goldens/manifest.json"))
    entry = [t for t in m["tests"] if t["name"] == "refr_mis0"][0]
    sc, cam, ps, vt = build_scene(entry)
    scene = sc.finalize()
    r = Renderer(RenderSettings(width=256, height=256), ps)
    r.render(scene, cam, spp)
    px = r.pixels(cam, vt)
    out = np.clip(np.asarray(px) * 255.0, 0, 255).astype(np.uint8)

    g = read_tga("tests/goldens/refr_mis0/ref.tga")[..., :3].astype(np.float32)
    o = out.astype(np.float32)
    gm, om = g.mean(-1), o.mean(-1)
    from scipy import ndimage

    blob = gm > 200
    print(f"spp={spp}")
    prev = blob
    for it in (1, 2, 4, 8):
        cur = ndimage.binary_dilation(blob, iterations=it)
        ring = cur & ~prev
        prev = cur
        print(f"ring d{it}: golden={gm[ring].mean():7.2f} "
              f"ours-g={(om - gm)[ring].mean():7.2f} n={ring.sum()}")
    inside = ndimage.binary_erosion(blob, iterations=2)
    plane = (gm > 20) & (gm < 150) & ~ndimage.binary_dilation(
        blob, iterations=10)
    print(f"inside: ours-g={(om - gm)[inside].mean():7.2f}")
    print(f"plane : ours-g={(om - gm)[plane].mean():7.2f}")
    d = np.abs(o.astype(np.int32) - g.astype(np.int32))
    mse = (d.astype(np.float64) ** 2).mean()
    print(f"psnr={-10*np.log10(mse/255.0**2):.2f} "
          f"fireflies={(d.max(-1) > 32).sum()}")
    np.save("/tmp/refr_hi_spp.npy", out)


if __name__ == "__main__":
    main()
