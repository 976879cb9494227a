"""Ortho camera (eCamType::Ortho — declared but unimplemented in the
reference, Core.cpp:1363) and the Geo-camera lightmap baker
(SampleMeshInTextureSpace, CoreRef.cpp:1555-1653)."""

import jax.numpy as jnp
import numpy as np

from ray_tpu.render.integrator import PassSettings, render_tile
from ray_tpu.render.lightmap import bake_lightmap, rasterize_uv_rays
from ray_tpu.scene.camera import CamType, build_filter_table, make_camera
from ray_tpu.scene.lights import LightDesc, LightType
from ray_tpu.scene.materials import MaterialDesc, ShadingNode
from ray_tpu.scene.scene import Scene
from ray_tpu.utils.geometry import make_quad

W = H = 16


def _wall_scene():
    """A single large wall at z=+1 facing the camera, lit by the env."""
    sc = Scene()
    m = sc.add_material(
        MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0.7, 0.7, 0.7))
    )
    v, idx, uv = make_quad((0, 0, 1.0), (4, 0, 0), (0, -4, 0))
    sc.add_mesh(v, idx, uvs=uv, material=m)
    sc.set_environment((1.0, 1.0, 1.0))
    return sc.finalize()


def _render_depth(cam, scene):
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    out = render_tile(
        scene, cam, table, jnp.int32(0), jnp.int32(0),
        jnp.uint32(1), jnp.uint32(0),
        width=W, height=H, tile_w=W, tile_h=H,
        settings=PassSettings(max_total_depth=1, min_total_depth=1),
        use_filter_table=False,
    )
    return np.asarray(out["depth_normal"])[:, 3], np.asarray(out["color"])


def test_ortho_rays_are_parallel():
    scene = _wall_scene()
    persp = make_camera(origin=(0, 0, -2), look_at=(0, 0, 1.0), fov=45.0)
    ortho = make_camera(
        origin=(0, 0, -2), look_at=(0, 0, 1.0), fov=45.0,
        cam_type=CamType.ORTHO,
    )
    t_p, _ = _render_depth(persp, scene)
    t_o, col_o = _render_depth(ortho, scene)
    assert (t_o > 0).all() and (t_p > 0).all()
    # parallel rays hit the perpendicular wall at identical depth;
    # perspective rays don't
    assert float(t_o.std()) < 1e-4
    assert float(t_p.std()) > 1e-3
    assert col_o.sum() > 0


def test_ortho_framing_matches_persp_at_focus_plane():
    """With the wall exactly at the focus distance, ortho and persp see the
    same extent of it (the ortho plane is defined to match there)."""
    scene = _wall_scene()
    # wall at z=1, camera at z=-2 → focus_distance 3
    persp = make_camera(origin=(0, 0, -2), look_at=(0, 0, 1.0), fov=45.0,
                        focus_distance=3.0)
    ortho = make_camera(origin=(0, 0, -2), look_at=(0, 0, 1.0), fov=45.0,
                        focus_distance=3.0, cam_type=CamType.ORTHO)
    _, col_p = _render_depth(persp, scene)
    _, col_o = _render_depth(ortho, scene)
    # interior pixels only — at the frame border persp rays graze past the
    # wall edge where ortho rays don't
    ip = col_p.reshape(H, W, 3)[1:-1, 1:-1]
    io = col_o.reshape(H, W, 3)[1:-1, 1:-1]
    np.testing.assert_allclose(io, ip, rtol=0.15, atol=0.02)


def _floor_light_scene():
    sc = Scene()
    m = sc.add_material(
        MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0.8, 0.8, 0.8))
    )
    # floor in the xz plane, +Y normal (cross(u, v) up), UVs spanning the
    # full unit square
    v, idx, uv = make_quad((0, 0, 0), (0, 0, 1), (1, 0, 0))
    sc.add_mesh(v, idx, uvs=uv, material=m)
    sc.add_light(
        LightDesc(
            type=LightType.SPHERE, color=(40.0, 40.0, 40.0),
            position=(0.0, 1.2, 0.0), radius=0.1,
        )
    )
    return sc.finalize()


def test_uv_rasterizer_coverage():
    scene = _floor_light_scene()
    rays, mask, prim = rasterize_uv_rays(
        np.asarray(scene.vertices), np.asarray(scene.normals),
        np.asarray(scene.uvs), np.asarray(scene.tri_vidx), 32, 32,
    )
    m = np.asarray(mask)
    assert m.mean() > 0.9                      # quad covers the UV square
    p = np.asarray(prim)
    assert set(np.unique(p[m])) <= {0, 1}
    # rays start just above the floor looking down
    ro = np.asarray(rays.ro)[m]
    rd = np.asarray(rays.rd)[m]
    assert np.abs(ro[:, 1] - 1e-3).max() < 1e-5
    np.testing.assert_allclose(rd[:, 1], -1.0, atol=1e-5)


def test_lightmap_bake_radiance_and_sh():
    scene = _floor_light_scene()
    settings = PassSettings(
        max_total_depth=2, min_total_depth=2, use_path_termination=False,
        output_sh=True,
    )
    out = bake_lightmap(scene, 16, 16, settings, iterations=32)
    mask = out["mask"]
    col = out["color"]
    assert mask.mean() > 0.9
    lum = col.sum(-1)
    # border texels can sit exactly on the UV seam and trace grazing —
    # allow a thin dark rim
    assert (lum[mask] > 0).mean() > 0.9        # lit texels
    # texels under the light (uv center) are brighter than the corners
    center = lum[7:9, 7:9].mean()
    corner = (lum[0, 0] + lum[0, -1] + lum[-1, 0] + lum[-1, -1]) / 4
    assert center > 2.0 * corner
    # SH L0 band integrates back to the texel radiance
    sh = out["shl1"]
    np.testing.assert_allclose(
        sh[..., 0, :], col * 0.282095, rtol=1e-3, atol=1e-5
    )
    # SH directions point TOWARD the radiance source (probe convention):
    # the light sits above the floor → positive Y coefficient dominates
    ym = sh[mask][:, 1, :].sum()
    assert ym > 0
