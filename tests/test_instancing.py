"""Two-level TLAS/BLAS instancing + per-ray-type visibility.

Reference parity targets:
* ``RebuildTLAS_nolock`` two-level traversal (SceneCPU.cpp:928,
  internal/CoreRef.cpp:1890-2740) — here validated by rendering the same
  scene through the flattened single-BVH path and the TLAS path and
  requiring (near) identical images;
* ``mesh_instance_desc_t`` per-ray-type visibility bools (SceneBase.h:135)
  — validated with camera-invisible and shadow-invisible occluders
  (the reference's test_scene.cpp ray-visibility-flag tests).
"""

import numpy as np
import pytest

from ray_tpu.render.integrator import PassSettings
from ray_tpu.render.renderer import Renderer, RenderSettings
from ray_tpu.scene.materials import MaterialDesc, ShadingNode
from ray_tpu.scene.scene import Scene
from ray_tpu.scene.visibility import RAY_ALL, visibility_mask
from ray_tpu.utils.geometry import make_quad, make_uv_sphere
from ray_tpu.utils.test_scenes import cornell_scene

RES = 32


def _render(flat, cam, spp=8, depth=3, res=RES):
    r = Renderer(
        RenderSettings(res, res),
        PassSettings(max_total_depth=depth, min_total_depth=depth),
    )
    return np.asarray(r.render(flat, cam, spp))


def _xlate(t, scale=1.0):
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = m[1, 1] = m[2, 2] = scale
    m[:3, 3] = t
    return m


def test_tlas_matches_flatten_cornell():
    """The two-level structure must be an implementation detail: same
    estimator, same RNG → same image as the flattened single BVH."""
    sc, cam = cornell_scene("emissive_quad")
    img_flat = _render(sc.finalize(instancing="flatten"), cam)
    img_tlas = _render(sc.finalize(instancing="tlas"), cam)
    assert np.max(np.abs(img_flat - img_tlas)) < 2e-3, (
        np.max(np.abs(img_flat - img_tlas))
    )


def test_tlas_instanced_transforms():
    """One sphere mesh instanced at three transformed placements must
    render identically to three pre-transformed copies."""
    env = (0.6, 0.7, 0.9)
    placements = [
        ((-1.6, 0.0, 0.0), 0.7),
        ((0.0, 0.3, 0.5), 1.0),
        ((1.7, -0.2, 0.0), 0.5),
    ]
    v, idx, n, uv = make_uv_sphere(radius=1.0)

    sc_i = Scene()
    m = sc_i.add_material(
        MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0.8, 0.4, 0.3))
    )
    mesh = sc_i.add_mesh(v, idx, normals=n, uvs=uv, material=m)
    for t, s in placements:
        sc_i.add_instance(mesh, _xlate(t, s))
    sc_i.set_environment(env)
    flat_i = sc_i.finalize(instancing="auto")
    assert flat_i.mode == "tlas"  # auto must detect the shared mesh

    sc_f = Scene()
    m2 = sc_f.add_material(
        MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0.8, 0.4, 0.3))
    )
    for t, s in placements:
        sc_f.add_mesh(v * s + np.asarray(t, np.float32), idx,
                      normals=n, uvs=uv, material=m2)
    sc_f.set_environment(env)
    flat_f = sc_f.finalize(instancing="flatten")

    from ray_tpu.scene.camera import make_camera
    cam = make_camera(origin=(0, 0, -6), look_at=(0, 0, 0), fov=45.0)
    # geometry must match exactly: AUX depth/normals come from the fixed
    # primary rays, independent of the sampled BSDF frames
    r_i = Renderer(RenderSettings(RES, RES),
                   PassSettings(max_total_depth=3, min_total_depth=3))
    r_i.render(flat_i, cam, 1)
    r_f = Renderer(RenderSettings(RES, RES),
                   PassSettings(max_total_depth=3, min_total_depth=3))
    r_f.render(flat_f, cam, 1)
    dn_i = np.asarray(r_i.aux_dn)
    dn_f = np.asarray(r_f.aux_dn)
    assert np.max(np.abs(dn_i - dn_f)) < 1e-3, np.max(np.abs(dn_i - dn_f))
    # radiance only matches in expectation: the radial tangent frame uses
    # OBJECT-space position (ShadeRef.cpp:1355-1366), which differs between
    # a shared centered mesh and pre-transformed copies, so the per-sample
    # BSDF directions legitimately diverge — compare 4x4 block means
    img_i = _render(flat_i, cam, spp=64)
    img_f = _render(flat_f, cam, spp=64)
    bi = img_i.reshape(RES // 4, 4, RES // 4, 4, 3).mean((1, 3))
    bf = img_f.reshape(RES // 4, 4, RES // 4, 4, 3).mean((1, 3))
    assert np.max(np.abs(bi - bf)) < 0.02, np.max(np.abs(bi - bf))


def test_tlas_instanced_emissive_lights():
    """Emissive mesh triangles must register one TRI light per *instance*
    (world-space), and NEE/MIS must stay consistent: NEE-on vs NEE-off
    converge to the same mean."""
    v, idx, uvq = make_quad((0, 0, 0), (0.3, 0, 0), (0, 0, 0.3))
    floor_v, floor_i, floor_uv = make_quad((0, -1, 0), (3, 0, 0), (0, 0, -3))

    sc = Scene()
    emis = sc.add_material(
        MaterialDesc(type=ShadingNode.EMISSIVE, base_color=(1, 1, 1),
                     strength=10.0, importance_sample=True, two_sided=True)
    )
    white = sc.add_material(
        MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0.7, 0.7, 0.7))
    )
    lamp = sc.add_mesh(v, idx, uvs=uvq, material=emis)
    floor = sc.add_mesh(floor_v, floor_i, uvs=floor_uv, material=white)
    sc.add_instance(lamp, _xlate((-0.8, 0.8, 0.0)))
    sc.add_instance(lamp, _xlate((0.8, 0.8, 0.0)))
    sc.add_instance(floor)
    flat = sc.finalize(instancing="tlas")
    # 2 instances × 2 emissive tris = 4 TRI lights
    assert flat.num_lights == 4

    from ray_tpu.scene.camera import make_camera
    cam = make_camera(origin=(0, 1.2, -3.2), look_at=(0, -0.4, 0), fov=50.0)
    r_on = Renderer(RenderSettings(RES, RES),
                    PassSettings(max_total_depth=3, use_nee=True))
    r_off = Renderer(RenderSettings(RES, RES),
                     PassSettings(max_total_depth=3, use_nee=False))
    img_on = np.asarray(r_on.render(flat, cam, 64))
    img_off = np.asarray(r_off.render(flat, cam, 512))
    assert img_on.mean() > 0.01
    rel = abs(img_on.mean() - img_off.mean()) / img_off.mean()
    assert rel < 0.05, (img_on.mean(), img_off.mean())


@pytest.mark.parametrize("mode", ["flatten", "tlas"])
def test_camera_invisible_occluder(mode):
    """A sphere invisible to camera rays must not show up in the image but
    must still receive/scatter indirect light (reference ray-visibility
    semantics)."""
    env = (1.0, 1.0, 1.0)
    v, idx, n, uv = make_uv_sphere(radius=1.0)

    def build(vis):
        sc = Scene()
        m = sc.add_material(
            MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0.1, 0.9, 0.1))
        )
        mesh = sc.add_mesh(v, idx, normals=n, uvs=uv, material=m)
        sc.add_instance(mesh, None, visibility=vis)
        sc.set_environment(env)
        from ray_tpu.scene.camera import make_camera
        cam = make_camera(origin=(0, 0, -4), look_at=(0, 0, 0), fov=40.0)
        return sc.finalize(instancing=mode), cam

    flat_vis, cam = build(RAY_ALL)
    flat_hidden, _ = build(visibility_mask(camera=False))
    img_vis = _render(flat_vis, cam, spp=4)
    img_hidden = _render(flat_hidden, cam, spp=4)
    c = RES // 2
    # visible: center shows the green sphere; hidden: pure env
    assert img_vis[c, c, 1] > img_vis[c, c, 0] * 1.5
    assert np.allclose(img_hidden, 1.0, atol=1e-4), (
        img_hidden.min(), img_hidden.max()
    )


@pytest.mark.parametrize("mode", ["flatten", "tlas"])
def test_shadow_invisible_occluder(mode):
    """A blocker excluded from shadow rays must not darken NEE lighting."""
    from ray_tpu.scene.camera import make_camera
    from ray_tpu.scene.lights import LightDesc, LightType

    floor_v, floor_i, floor_uv = make_quad((0, 0, 0), (2, 0, 0), (0, 0, -2))
    blk_v, blk_i, blk_uv = make_quad((0, 1.0, 0), (0.8, 0, 0), (0, 0, -0.8))

    def build(vis):
        sc = Scene()
        white = sc.add_material(
            MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0.8, 0.8, 0.8))
        )
        floor = sc.add_mesh(floor_v, floor_i, uvs=floor_uv, material=white)
        blocker = sc.add_mesh(blk_v, blk_i, uvs=blk_uv, material=white)
        sc.add_instance(floor)
        sc.add_instance(blocker, None, visibility=vis)
        sc.add_light(
            LightDesc(type=LightType.SPHERE, color=(40, 40, 40),
                      position=(0, 2.0, 0), radius=0.05, visible=False)
        )
        cam = make_camera(origin=(0, 2.5, -3.5), look_at=(0, 0, 0), fov=40.0)
        return sc.finalize(instancing=mode), cam

    # both blockers are camera-invisible so the camera sees the floor;
    # they differ only in the shadow bit
    flat_solid, cam = build(visibility_mask(camera=False))
    flat_noshadow, _ = build(visibility_mask(camera=False, shadow=False))
    img_solid = _render(flat_solid, cam, spp=8, depth=2)
    img_noshadow = _render(flat_noshadow, cam, spp=8, depth=2)
    c = RES // 2
    # solid blocker: the floor center is in shadow; shadow-invisible: lit
    assert img_noshadow[c, c].mean() > 4.0 * max(img_solid[c, c].mean(), 1e-3), (
        img_solid[c, c].mean(), img_noshadow[c, c].mean()
    )


def test_wide_tlas_matches_binary():
    """The wide unified-table two-level machine (build_wtlas +
    _traverse_wide_tlas) must reproduce the binary TLAS traversal exactly:
    same prim, same inst, same t — including under non-uniform instance
    scale and per-instance visibility masks."""
    import jax.numpy as jnp

    from ray_tpu.ops.traverse import (
        trace_closest_tlas,
        trace_occlusion_tlas,
        _traverse_tlas,
    )
    from ray_tpu.scene.visibility import RAY_CAMERA, RAY_SHADOW

    sc = Scene()
    sc.add_material(MaterialDesc(type=ShadingNode.DIFFUSE))
    v, idx, n, uv = make_uv_sphere(rings=12, segments=20)  # 440 tris
    mesh = sc.add_mesh(v, idx, normals=n, uvs=uv)
    m0 = _xlate((-1.2, 0.0, 0.0), 0.8)
    m1 = np.eye(4, dtype=np.float32)
    m1[:3, :3] = np.diag([1.5, 0.6, 1.0])   # non-uniform scale
    m1[:3, 3] = (1.0, 0.2, 0.6)
    sc.add_instance(mesh, m0)
    sc.add_instance(mesh, m1, visibility=RAY_SHADOW)  # camera-invisible
    flat = sc.finalize(instancing="tlas")
    assert "wrows_tlas" in flat.bvh_soa, "wide table should be built"

    rng = np.random.default_rng(7)
    R = 2048
    ro = jnp.asarray(rng.uniform(-3, 3, (R, 3)).astype(np.float32))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    t0 = jnp.zeros((R,), jnp.float32)
    t1 = jnp.full((R,), 1e30, jnp.float32)
    act = jnp.ones((R,), jnp.bool_)

    for mask_val in (RAY_CAMERA, RAY_SHADOW):
        mask = jnp.full((R,), mask_val, jnp.int32)
        hw = trace_closest_tlas(
            flat.bvh_soa, flat.tri_soa, flat.inst, ro, rd, t0, t1, act,
            ray_mask=mask, max_leaf=flat.max_leaf,
            stack_size=flat.stack_size,
        )
        hb = _traverse_tlas(
            flat.bvh_soa, flat.tri_soa, flat.inst, ro, rd, t0, t1, act,
            mask, flat.max_leaf, flat.stack_size, any_hit=False,
        )
        same = np.asarray(hw.prim) == np.asarray(hb.prim)
        assert same.mean() > 0.995, same.mean()   # exact ties only
        m = same & (np.asarray(hb.prim) >= 0)
        np.testing.assert_array_equal(
            np.asarray(hw.inst)[m], np.asarray(hb.inst)[m]
        )
        np.testing.assert_allclose(
            np.asarray(hw.t)[m], np.asarray(hb.t)[m], rtol=1e-4
        )
        ow = trace_occlusion_tlas(
            flat.bvh_soa, flat.tri_soa, flat.inst, ro, rd, t0, t1, act,
            ray_mask=mask, max_leaf=flat.max_leaf,
            stack_size=flat.stack_size,
        )
        # any-hit may find *some* hit where closest exists; occlusion sets
        # must match the binary machine's notion of "anything in range"
        assert (np.asarray(ow) == (np.asarray(hb.prim) >= 0)).mean() > 0.995


def test_wide_tlas_render_matches_flatten():
    """Instancing-heavy scene >256 tris: the wide two-level path must
    produce the same image as the flattened single-BVH path."""
    env = (0.5, 0.6, 0.8)
    sc = Scene()
    sc.add_material(MaterialDesc(type=ShadingNode.DIFFUSE,
                                 base_color=(0.6, 0.5, 0.4)))
    v, idx, n, uv = make_uv_sphere(rings=10, segments=16)
    mesh = sc.add_mesh(v, idx, normals=n, uvs=uv)
    for k, (t, s) in enumerate([((-1.5, 0, 0), 0.7), ((0, 0, 0.4), 1.0),
                                ((1.5, 0.2, 0), 0.5)]):
        sc.add_instance(mesh, _xlate(t, s))
    sc.set_environment(env)
    from ray_tpu.scene.camera import make_camera
    cam = make_camera(origin=(0, 1.5, -5), look_at=(0, 0, 0), fov=45.0)

    tl = sc.finalize(instancing="tlas")
    assert "wrows_tlas" in tl.bvh_soa
    img_tlas = _render(tl, cam)
    img_flat = _render(sc.finalize(instancing="flatten"), cam)
    assert np.max(np.abs(img_flat - img_tlas)) < 2e-3, (
        np.max(np.abs(img_flat - img_tlas))
    )
