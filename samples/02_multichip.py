"""Tile-sharded rendering over a device mesh — the TPU counterpart of
samples/02_multithreading (the reference threads tiles; we shard row bands
over chips with shard_map and psum the stats).  Runs on any device count;
use XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
to simulate a mesh on CPU."""

import os, sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# single-accelerator hosts: simulate an 8-chip mesh on CPU (a real pod
# runs this unchanged on its chip mesh)
if "--real" not in sys.argv:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax, jax.numpy as jnp, numpy as np

if "--real" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
from jax.sharding import Mesh

from ray_tpu.parallel.shard import TILE_AXIS, render_sharded
from ray_tpu.render.integrator import PassSettings
from ray_tpu.scene.camera import build_filter_table
from ray_tpu.utils.image_io import write_tga
from ray_tpu.utils.test_scenes import cornell_scene


def main(samples=4, size=64):
    sc, cam = cornell_scene("emissive_quad")
    scene = sc.finalize()
    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, (TILE_AXIS,))
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    settings = PassSettings(max_total_depth=4)

    acc = jnp.zeros((size * size, 3), jnp.float32)
    for it in range(1, samples + 1):
        out = render_sharded(
            scene, cam, table, jnp.uint32(it), jnp.uint32(0),
            mesh=mesh, width=size, height=size, settings=settings,
        )
        acc = acc + out["color"]
    img = np.asarray(acc / samples).reshape(size, size, 3)
    write_tga("02_multichip.tga", np.clip(img, 0, 1) ** (1 / 2.2))
    print(f"rendered on {devices.size} device(s); wrote 02_multichip.tga")


if __name__ == "__main__":
    main()
