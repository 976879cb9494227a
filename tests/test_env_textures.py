"""Environment-map importance sampling + texture pipeline tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tpu.render.integrator import PassSettings, render_tile
from ray_tpu.render.renderer import Renderer, RenderSettings
from ray_tpu.scene.camera import build_filter_table, make_camera
from ray_tpu.scene.materials import MaterialDesc, ShadingNode
from ray_tpu.scene.scene import Scene
from ray_tpu.utils.geometry import make_quad, make_uv_sphere

RES = 24


def _sphere_env_scene(env_img, albedo=(1.0, 1.0, 1.0)):
    sc = Scene()
    mat = sc.add_material(
        MaterialDesc(type=ShadingNode.DIFFUSE, base_color=albedo, roughness=0.0)
    )
    v, idx, n, uv = make_uv_sphere()
    sc.add_mesh(v, idx, normals=n, uvs=uv, material=mat)
    tex = sc.add_texture(env_img, generate_mips=False)
    sc.set_environment((1.0, 1.0, 1.0), map_id=tex)
    cam = make_camera(origin=(0, 0, -4), look_at=(0, 0, 0), fov=40.0)
    return sc.finalize(), cam


def _render(flat, cam, spp, depth=3, use_nee=True):
    r = Renderer(
        RenderSettings(RES, RES),
        PassSettings(max_total_depth=depth, min_total_depth=depth, use_nee=use_nee),
    )
    return r.render(flat, cam, spp)


def test_env_map_furnace():
    """Constant env map + importance sampling: pdf and radiance must cancel
    exactly → furnace value 1 (a wrong CDF pdf breaks this immediately)."""
    env = np.ones((32, 64, 3), np.float32)
    flat, cam = _sphere_env_scene(env)
    assert flat.env_tab_h == 32
    img = _render(flat, cam, spp=16)
    c = RES // 2
    center = img[c - 3 : c + 3, c - 3 : c + 3]
    assert abs(center.mean() - 1.0) < 0.03, center.mean()


def test_env_map_hotspot_consistency():
    """HDRI-style env (dark + one very bright blob): NEE-with-CDF vs plain
    BSDF sampling converge to the same mean."""
    env = np.full((32, 64, 3), 0.05, np.float32)
    env[8:12, 10:16] = 50.0
    flat, cam = _sphere_env_scene(env)
    a = _render(flat, cam, spp=48)
    b = _render(flat, cam, spp=512, use_nee=False)
    rel = abs(a.mean() - b.mean()) / max(a.mean(), 1e-9)
    assert rel < 0.12, (a.mean(), b.mean())
    # importance sampling should make the NEE render far less noisy:
    # pixel variance of the sphere region under equal low spp
    a2 = _render(flat, cam, spp=8)
    b2 = _render(flat, cam, spp=8, use_nee=False)
    c = RES // 2
    va = np.var(a2[c - 4 : c + 4, c - 4 : c + 4])
    vb = np.var(b2[c - 4 : c + 4, c - 4 : c + 4])
    assert va < vb, (va, vb)


def test_checkerboard_texture_colors():
    """Textured diffuse emitter viewed head-on reproduces texel colors."""
    sc = Scene()
    # 4-texel cells so bilinear filtering leaves flat interiors
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    cell = ((yy // 4 + xx // 4) % 2).astype(np.float32)
    check = np.stack([cell, np.zeros_like(cell), 1.0 - cell], axis=-1)
    tex = sc.add_texture(check, generate_mips=False)
    mat = sc.add_material(
        MaterialDesc(
            type=ShadingNode.EMISSIVE, base_color=(1, 1, 1), strength=1.0,
            base_texture=tex,
        )
    )
    v, idx, uvs = make_quad((0, 0, 0), (0, -1, 0), (1, 0, 0))
    sc.add_mesh(v, idx, uvs=uvs, material=mat)
    cam = make_camera(origin=(0, 0, -3), look_at=(0, 0, 0), fov=45.0)
    flat = sc.finalize()

    r = Renderer(RenderSettings(32, 32), PassSettings(max_total_depth=1))
    img = r.render(flat, cam, 8)
    # center of the quad: sum of R+B across the checker must be ~1, G ~0
    center = img[8:24, 8:24]
    assert center[..., 1].max() < 1e-3
    rb = center[..., 0] + center[..., 2]
    np.testing.assert_allclose(rb[rb > 0.5], 1.0, atol=0.05)
    # both colors appear
    assert (center[..., 0] > 0.9).any()
    assert (center[..., 2] > 0.9).any()


def test_texture_gradient_vs_fd():
    """Gradient of mean radiance w.r.t. a texel (BASELINE config
    01_texturing: bilinear texture-gradient backward)."""
    sc = Scene()
    flatgray = np.full((4, 4, 3), 0.5, np.float32)
    tex = sc.add_texture(flatgray, generate_mips=False)
    mat = sc.add_material(
        MaterialDesc(
            type=ShadingNode.DIFFUSE, base_color=(1, 1, 1), roughness=0.0,
            base_texture=tex,
        )
    )
    v, idx, n, uv = make_uv_sphere()
    sc.add_mesh(v, idx, normals=n, uvs=uv, material=mat)
    sc.set_environment((1.0, 1.0, 1.0))
    cam = make_camera(origin=(0, 0, -4), look_at=(0, 0, 0), fov=40.0)
    flat = sc.finalize()
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    settings = PassSettings(max_total_depth=2, min_total_depth=2)

    def loss(texels):
        s = dataclasses.replace(
            flat, textures={**flat.textures, "texels_t": texels}
        )
        out = render_tile(
            s, cam, table, jnp.int32(0), jnp.int32(0), jnp.uint32(1),
            jnp.uint32(0), width=16, height=16, tile_w=16, tile_h=16,
            settings=settings, use_filter_table=False,
        )
        return jnp.mean(out["color"])

    t0 = flat.textures["texels_t"]
    g = jax.grad(loss)(t0)
    assert np.isfinite(np.asarray(g)).all()
    # FD check on one texel channel with nonzero gradient
    gn = np.asarray(g)
    i, c = np.unravel_index(np.argmax(np.abs(gn)), gn.shape)
    eps = 1e-2
    f_p = loss(t0.at[i, c].add(eps))
    f_m = loss(t0.at[i, c].add(-eps))
    fd = (float(f_p) - float(f_m)) / (2 * eps)
    np.testing.assert_allclose(float(gn[i, c]), fd, rtol=0.05, atol=1e-5)


def test_ray_cone_mip_selection():
    """Ray-cone texture LOD (reference ShadeRef.cpp:1279-1283 +
    get_texture_lod): a far-away high-frequency checker must be fetched
    from a coarse mip (≈0.5 uniform gray), not from mip 0 (noisy 0/1).
    Without LOD the per-pixel values are bimodal; with it they concentrate
    at the checker mean."""
    checker = np.indices((256, 256)).sum(0) % 2
    img = np.repeat(checker[..., None], 3, axis=-1).astype(np.float32)

    sc = Scene()
    tex = sc.add_texture(img)
    mat = sc.add_material(
        MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(1, 1, 1),
                     base_texture=tex)
    )
    # quad very far away: each pixel footprint covers many texels
    v, idx, uvq = make_quad((0, 0, 200), (40, 0, 0), (0, -40, 0))
    sc.add_mesh(v, idx, uvs=uvq, material=mat)
    sc.set_environment((1.0, 1.0, 1.0))
    flat = sc.finalize()
    cam = make_camera(origin=(0, 0, 0), look_at=(0, 0, 1), fov=30.0)

    r = Renderer(
        RenderSettings(32, 32),
        PassSettings(max_total_depth=2, min_total_depth=2),
    )
    out = np.asarray(r.render(flat, cam, 4))
    center = out[8:24, 8:24, 0]
    # furnace: L = albedo(=checker mip) × env(=1); coarse mip ⇒ ≈0.5
    assert abs(center.mean() - 0.5) < 0.08, center.mean()
    assert center.std() < 0.1, center.std()
