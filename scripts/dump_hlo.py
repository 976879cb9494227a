"""Dump the compiled HLO of the colonnade tile and locate hot ops from the
profile (while.46, fusion.19xx) via their metadata op_name/source lines."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from ray_tpu.render.integrator import PassSettings, render_tile
    from ray_tpu.scene.camera import build_filter_table
    from ray_tpu.utils.test_scenes import colonnade_scene

    W, H, tw, th = 1920, 1080, 960, 540
    sc, cam = colonnade_scene()
    scene = sc.finalize()
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    settings = PassSettings(max_total_depth=5, min_total_depth=2, remat=True)

    def f(it):
        return render_tile(
            scene, cam, table, jnp.int32(0), jnp.int32(0), it, jnp.uint32(0),
            width=W, height=H, tile_w=tw, tile_h=th,
            settings=settings, use_filter_table=False,
        )["color"]

    lowered = jax.jit(f).lower(jnp.uint32(1))
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/colonnade.hlo", "w") as fh:
        fh.write(txt)
    print(f"HLO: {len(txt)} chars -> /tmp/colonnade.hlo")
    for name in sys.argv[1:]:
        for m in re.finditer(re.escape(name) + r"\b[^\n]*", txt):
            line = m.group(0)
            print(f"--- {name}: {line[:400]}")
            break


if __name__ == "__main__":
    main()
