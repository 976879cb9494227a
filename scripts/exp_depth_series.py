#!/usr/bin/env python3
"""Per-depth-cap transport-parity instrumentation (VERDICT r3 next #1).

Renders a golden test scene at a series of depth caps with ray_tpu and
compares against the reference renderer's renders at the SAME caps
(tools/golden: GG_MAX_*_DEPTH env overrides write ref_<sfx>.tga).  The
per-cap mean-signed-error series localizes which bounce carries any
energy difference.

Usage (on the real device):
    python scripts/exp_depth_series.py diff_mat0 dcap 2 3 4 5 6 8
where `dcap` selects which cap to sweep: dcap=max_diff_depth,
tcap=max_total_depth.  Reads tests/goldens/<name>/ref_<which><k>.tga.
"""
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SPP = int(os.environ.get("EXP_SPP", "512"))


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "diff_mat0"
    which = sys.argv[2] if len(sys.argv) > 2 else "dcap"
    caps = [int(c) for c in sys.argv[3:]] or [2, 3, 4, 5, 6, 8]

    import json
    from golden_scene import build_scene
    from ray_tpu.render.renderer import Renderer, RenderSettings
    from ray_tpu.utils.image_io import read_tga

    with open("tests/goldens/manifest.json") as f:
        entry = next(t for t in json.load(f)["tests"] if t["name"] == name)

    sc, cam, ps, vt = build_scene(entry)
    scene = sc.finalize()
    field = {"dcap": "max_diff_depth", "tcap": "max_total_depth"}[which]

    for k in caps:
        ps_k = dataclasses.replace(ps, **{field: k})
        r = Renderer(RenderSettings(width=256, height=256), ps_k)
        r.render(scene, cam, SPP)
        px = np.asarray(r.pixels(cam, vt))
        out_u8 = np.clip(px * 255.0, 0, 255).astype(np.uint8)

        from ray_tpu.utils.image_io import write_tga
        sfx = os.environ.get("EXP_REF_SUFFIX", f"{which}{k}")
        write_tga(f"tests/goldens/{name}/tpu_{sfx}.tga", out_u8)
        ref_path = f"tests/goldens/{name}/ref_{sfx}.tga"
        if not os.path.exists(ref_path):
            print(f"cap {k}: ours mean {out_u8.mean():8.4f} (no ref render)")
            continue
        ref = read_tga(ref_path)[..., :3].astype(np.float32)
        ours = out_u8.astype(np.float32)
        diff = ours - ref
        print(f"cap {k}: ours {ours.mean():8.4f}  ref {ref.mean():8.4f}  "
              f"mean-signed {diff.mean():+7.4f}  mean-abs {np.abs(diff).mean():6.4f}")


if __name__ == "__main__":
    main()
