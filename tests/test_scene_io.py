"""SceneFlat .npz round trip: identical renders before/after (the scene-
compile complement of the renderer's checkpoint/resume)."""

import jax
import jax.numpy as jnp
import numpy as np

from ray_tpu.render.integrator import PassSettings, render_tile
from ray_tpu.scene.camera import build_filter_table
from ray_tpu.scene.scene_io import load_scene, save_scene
from ray_tpu.utils.test_scenes import cornell_scene


def _render(scene, cam, size=24):
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    return np.asarray(render_tile(
        scene, cam, table, jnp.int32(0), jnp.int32(0), jnp.uint32(1),
        jnp.uint32(0), width=size, height=size, tile_w=size, tile_h=size,
        settings=PassSettings(max_total_depth=3, min_total_depth=3),
        use_filter_table=False,
    )["color"])


def test_scene_roundtrip_renders_identically(tmp_path):
    sc, cam = cornell_scene("emissive_quad")
    scene = sc.finalize()
    p = str(tmp_path / "scene.npz")
    save_scene(p, scene)
    back = load_scene(p)

    # every array leaf survives exactly
    la = jax.tree_util.tree_leaves(scene)
    lb = jax.tree_util.tree_leaves(back)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    np.testing.assert_array_equal(_render(scene, cam), _render(back, cam))


def test_scene_roundtrip_tlas(tmp_path):
    from ray_tpu.scene.materials import MaterialDesc, ShadingNode
    from ray_tpu.scene.scene import Scene
    from ray_tpu.utils.geometry import make_uv_sphere

    sc = Scene()
    sc.add_material(MaterialDesc(type=ShadingNode.DIFFUSE))
    v, idx, n, uv = make_uv_sphere(rings=6, segments=8)
    mesh = sc.add_mesh(v, idx, normals=n, uvs=uv, material=0)
    for x in (-1.5, 0.0, 1.5):
        xf = np.eye(4, dtype=np.float32)
        xf[0, 3] = x
        sc.add_instance(mesh, xf)
    sc.set_environment((1.0, 1.0, 1.0))
    scene = sc.finalize(instancing="tlas")
    assert scene.mode == "tlas"
    p = str(tmp_path / "scene_tlas.npz")
    save_scene(p, scene)
    back = load_scene(p)
    assert back.mode == "tlas"
    from ray_tpu.scene.camera import make_camera

    cam = make_camera(origin=(0, 0, -5), look_at=(0, 0, 0), fov=50)
    np.testing.assert_array_equal(_render(scene, cam), _render(back, cam))
