"""ray_tpu reconstruction of the reference's material-test scene.

Mirrors the reference's ``setup_test_scene`` (tests/test_scene.cpp:228-1009)
from the same data: the shipped mat_test meshes
(/root/reference/tests/test_data/meshes/mat_test/*.bin), shipped textures,
and the substitute backdrop meshes (tests/goldens/meshes/*, see
tools/golden/make_env_mesh.py) that replace the stripped env.bin /
env_floor.bin.  The C++ golden generator (tools/golden/golden_gen.cpp)
builds the *same* scene for the reference renderer, so golden comparisons
run on identical scene definitions.
"""

from __future__ import annotations

import math
import os
import struct

import numpy as np

from ray_tpu.render.integrator import PassSettings
from ray_tpu.render.tonemap import ViewTransform
from ray_tpu.scene.camera import PixelFilter, make_camera
from ray_tpu.scene.lights import LightDesc, LightType
from ray_tpu.scene.materials import NO_TEXTURE, MaterialDesc, ShadingNode
from ray_tpu.scene.scene import Scene

REF_TESTS = "/root/reference/tests"
MESHES_DIR = os.path.join(os.path.dirname(__file__), "goldens", "meshes")

# ---------------------------------------------------------------------------
# asset loaders
# ---------------------------------------------------------------------------


def load_bin(path):
    """Reference raw mesh blob (tests/utils.cpp:72 LoadBIN): attrs
    (pos3|n3|uv2 stride 8), u32 indices, u32 (offset,count) group pairs."""
    with open(path, "rb") as f:
        na, ni, ng = struct.unpack("<III", f.read(12))
        attrs = np.frombuffer(f.read(4 * na), "<f4").reshape(-1, 8)
        idx = np.frombuffer(f.read(4 * ni), "<u4").astype(np.int64)
        groups = np.frombuffer(f.read(4 * ng), "<u4").astype(np.int64)
    return attrs, idx, groups.reshape(-1, 2)


def load_tga_flipped(path):
    """LoadTGA(flip_y=true) equivalent (tests/test_scene.cpp:58)."""
    from ray_tpu.utils.image_io import read_tga

    img = read_tga(path)
    return img[::-1]


def load_dds_bc4(path):
    """Minimal DDS reader for the single-channel BC4 textures the test
    battery uses (Fence opacity).  Returns (H, W) uint8 of mip 0."""
    with open(path, "rb") as f:
        magic = f.read(4)
        assert magic == b"DDS ", path
        hdr = f.read(124)
        h, w = struct.unpack("<II", hdr[8:16])
        fourcc = hdr[80:84]
        if fourcc == b"DX10":
            f.read(20)
        data = f.read(((w + 3) // 4) * ((h + 3) // 4) * 8)
    return _decode_bc4(np.frombuffer(data, np.uint8), w, h)


def _decode_bc4(blocks, w, h):
    bw, bh = (w + 3) // 4, (h + 3) // 4
    blocks = blocks[: bw * bh * 8].reshape(bw * bh, 8)
    r0 = blocks[:, 0].astype(np.float32)
    r1 = blocks[:, 1].astype(np.float32)
    bits = (
        blocks[:, 2:8].astype(np.uint64)
        << (8 * np.arange(6, dtype=np.uint64))[None, :]
    ).sum(axis=1)
    idx = (bits[:, None] >> (3 * np.arange(16, dtype=np.uint64))[None, :]) & 7
    idx = idx.astype(np.int32)
    # BC4 palette (8 entries)
    pal = np.zeros((bw * bh, 8), np.float32)
    pal[:, 0] = r0
    pal[:, 1] = r1
    gt = r0 > r1
    for i in range(1, 7):
        pal[gt, i + 1] = ((7 - i) * r0[gt] + i * r1[gt]) / 7.0
    for i in range(1, 5):
        pal[~gt, i + 1] = ((5 - i) * r0[~gt] + i * r1[~gt]) / 5.0
    pal[~gt, 6] = 0.0
    pal[~gt, 7] = 255.0
    texels = np.take_along_axis(pal, idx, axis=1)  # (B, 16)
    out = np.zeros((bh * 4, bw * 4), np.float32)
    t = texels.reshape(bh, bw, 4, 4)
    out = t.transpose(0, 2, 1, 3).reshape(bh * 4, bw * 4)
    return out[:h, :w].astype(np.uint8)


# ---------------------------------------------------------------------------
# materials
# ---------------------------------------------------------------------------

_NODE_TYPES = {
    "diffuse": ShadingNode.DIFFUSE,
    "glossy": ShadingNode.GLOSSY,
    "refractive": ShadingNode.REFRACTIVE,
    "emissive": ShadingNode.EMISSIVE,
    "transparent": ShadingNode.TRANSPARENT,
}

_TEX_SLOTS = ("base_texture", "normal_map", "roughness_texture",
              "metallic_texture", "alpha_texture")


def _load_slot_texture(sc: Scene, path: str, role: str) -> int:
    """Texture loading mirroring load_needed_textures
    (tests/test_scene.cpp:46-226): base = sRGB + mips; normal map = linear,
    no mips; single-channel roles use the red channel."""
    full = os.path.join(REF_TESTS, path)
    if path.endswith(".dds"):
        img = load_dds_bc4(full)[::-1]  # DX convention: flip to GL rows
    else:
        img = load_tga_flipped(full)
        if role in ("single",):
            img = img[..., 0]
        else:
            img = img[..., :3]
    return sc.add_texture(
        img,
        srgb=(role == "base"),
        generate_mips=(role not in ("normal",) and not path.endswith(".dds")),
    )


def material_from_entry(sc: Scene, entry: dict) -> int:
    """Manifest material → ray_tpu MaterialDesc (+ texture loads)."""
    mat = dict(entry["mat"])
    kw = {}
    textures = entry.get("textures", [])
    roles = {"base_texture": "base", "normal_map": "normal",
             "roughness_texture": "single", "metallic_texture": "single",
             "alpha_texture": "single"}
    for slot in _TEX_SLOTS:
        if slot in mat:
            tex_idx = int(mat.pop(slot))
            kw[slot] = _load_slot_texture(sc, textures[tex_idx], roles[slot])

    if entry["mat_kind"] == "node":
        # shading_node_desc_t defaults (SceneBase.h:46-67): roughness 0,
        # specular 0, strength 1, ior 1, tint 0
        node = _NODE_TYPES[mat.pop("type", "diffuse")]
        return sc.add_material(MaterialDesc(
            type=node,
            base_color=tuple(mat.get("base_color", (1.0, 1.0, 1.0))),
            roughness=float(mat.get("roughness", 0.0)),
            anisotropic=float(mat.get("anisotropic", 0.0)),
            anisotropic_rotation=float(mat.get("anisotropic_rotation", 0.0)),
            sheen=float(mat.get("sheen", 0.0)),
            specular=float(mat.get("specular", 0.0)),
            strength=float(mat.get("strength", 1.0)),
            ior=float(mat.get("ior", 1.0)),
            tint=float(mat.get("tint", 0.0)),
            **kw,
        ))
    # principled_mat_desc_t defaults (SceneBase.h:69-98) — identical to
    # MaterialDesc defaults except metallic/others listed explicitly
    return sc.add_material(MaterialDesc(
        type=ShadingNode.PRINCIPLED,
        base_color=tuple(mat.get("base_color", (1.0, 1.0, 1.0))),
        metallic=float(mat.get("metallic", 0.0)),
        specular=float(mat.get("specular", 0.5)),
        specular_tint=float(mat.get("specular_tint", 0.0)),
        roughness=float(mat.get("roughness", 0.5)),
        anisotropic=float(mat.get("anisotropic", 0.0)),
        anisotropic_rotation=float(mat.get("anisotropic_rotation", 0.0)),
        sheen=float(mat.get("sheen", 0.0)),
        sheen_tint=float(mat.get("sheen_tint", 0.5)),
        clearcoat=float(mat.get("clearcoat", 0.0)),
        clearcoat_roughness=float(mat.get("clearcoat_roughness", 0.0)),
        ior=float(mat.get("ior", 1.45)),
        transmission=float(mat.get("transmission", 0.0)),
        transmission_roughness=float(mat.get("transmission_roughness", 0.0)),
        emission_color=tuple(mat.get("emission_color", (0.0, 0.0, 0.0))),
        emission_strength=float(mat.get("emission_strength", 1.0)),
        alpha=float(mat.get("alpha", 1.0)),
        normal_map_intensity=float(mat.get("normal_map_intensity", 1.0)),
        **kw,
    ))


# ---------------------------------------------------------------------------
# scene assembly
# ---------------------------------------------------------------------------


def _xf(ref16):
    """Reference column-major float[16] → row-major 4x4."""
    return np.asarray(ref16, np.float32).reshape(4, 4).T


_MODEL_XFORM = _xf([0.707106769, 0.0, 0.707106769, 0.0,
                    0.0, 1.0, 0.0, 0.0,
                    -0.707106769, 0.0, 0.707106769, 0.0,
                    0.0, 0.062, 0.0, 1.0])

_RECT_LIGHT_XFORM = [-0.425036609, 2.24262476e-06, -0.905176163, 0.0,
                     -0.876228273, 0.250873595, 0.411444396, 0.0,
                     0.227085724, 0.968019843, -0.106628500, 0.0,
                     -0.436484009, 0.187178999, 0.204932004, 1.0]

_DISK_LIGHT_XFORM = [0.813511789, -0.536388099, -0.224691749, 0.0,
                     0.538244009, 0.548162937, 0.640164733, 0.0,
                     -0.220209062, -0.641720533, 0.734644651, 0.0,
                     0.360500991, 0.461762011, 0.431780994, 1.0]

_LINE_LIGHT_XFORM = [0.813511789, -0.536388099, -0.224691749, 0.0,
                     0.538244009, 0.548162937, 0.640164733, 0.0,
                     -0.220209062, -0.641720533, 0.734644651, 0.0,
                     0.0, 0.461762, 0.0, 1.0]


def _col(ref16, j):
    return (ref16[4 * j + 0], ref16[4 * j + 1], ref16[4 * j + 2])


def _add_bin_mesh(sc: Scene, path: str, group_mats) -> int:
    """group_mats: list of (front, back) material ids, one per group."""
    attrs, idx, groups = load_bin(path)
    tris = idx.reshape(-1, 3)
    tri_mats = np.zeros((tris.shape[0], 2), np.int32)
    assert groups.shape[0] == len(group_mats), path
    for (off, cnt), (fm, bm) in zip(groups, group_mats):
        assert off % 3 == 0 and cnt % 3 == 0
        tri_mats[off // 3:(off + cnt) // 3] = (fm, bm)
    return sc.add_mesh(
        vertices=attrs[:, 0:3], indices=tris,
        normals=attrs[:, 3:6], uvs=attrs[:, 6:8],
        tri_materials=tri_mats,
    )


def build_scene(entry: dict):
    """Build the (Scene-not-finalized, Camera, PassSettings, view_transform)
    for one manifest entry."""
    scene_name = entry["scene"]
    sc = Scene()

    main_mat = material_from_entry(sc, entry)

    def grey(v):
        return sc.add_material(MaterialDesc(
            type=ShadingNode.PRINCIPLED, base_color=(v, v, v),
            roughness=0.0, specular=0.0))

    floor_mat = grey(0.75)
    walls_mat = grey(0.5)
    white_mat = grey(0.64)
    light_grey_mat = grey(0.32)
    mid_grey_mat = grey(0.16)
    dark_grey_mat = grey(0.08)

    def emissive(strength):
        return sc.add_material(MaterialDesc(
            type=ShadingNode.EMISSIVE, base_color=(1.0, 1.0, 1.0),
            strength=strength, importance_sample=True))

    square_light_mat = emissive(20.3718)
    disc_light_mat = emissive(81.4873)

    # flags_override: used ONLY by the denoiser-training data generator
    # (scripts/train_unet.py) to draw randomized variants of the mirror-box
    # class; golden tests never set it, so test scenes are unchanged
    _fl = entry.get("flags_override", {})
    glossy_red = sc.add_material(MaterialDesc(
        type=ShadingNode.GLOSSY,
        base_color=tuple(_fl.get("red_color", (1.0, 0.0, 0.0))),
        roughness=float(_fl.get("roughness", 0.0))))
    glossy_green = sc.add_material(MaterialDesc(
        type=ShadingNode.GLOSSY,
        base_color=tuple(_fl.get("green_color", (0.0, 1.0, 0.0))),
        roughness=float(_fl.get("roughness", 0.0))))
    refr_mat_flags = sc.add_material(MaterialDesc(
        type=ShadingNode.PRINCIPLED, roughness=0.0, transmission=1.0,
        ior=float(_fl.get("ior", 2.3))))

    if scene_name == "Standard_GlassBall0":
        glassball_mat0 = sc.add_material(MaterialDesc(
            type=ShadingNode.REFRACTIVE, base_color=(1.0, 1.0, 1.0),
            roughness=0.0, ior=1.45))
        glassball_mat1 = sc.add_material(MaterialDesc(
            type=ShadingNode.REFRACTIVE, base_color=(1.0, 1.0, 1.0),
            roughness=0.0, ior=1.0))
    else:
        glassball_mat0 = sc.add_material(MaterialDesc(
            type=ShadingNode.PRINCIPLED, base_color=(1.0, 1.0, 1.0),
            roughness=0.0, ior=1.45, transmission=1.0))
        glassball_mat1 = sc.add_material(MaterialDesc(
            type=ShadingNode.PRINCIPLED, base_color=(1.0, 1.0, 1.0),
            roughness=0.0, ior=1.0, transmission=1.0))

    two_sided_back = sc.add_material(MaterialDesc(
        type=ShadingNode.PRINCIPLED, base_color=(0.0, 0.0, 0.5),
        roughness=0.0))

    mt = os.path.join(REF_TESTS, "test_data", "meshes", "mat_test")
    base_mesh = _add_bin_mesh(sc, os.path.join(mt, "base.bin"),
                              [(mid_grey_mat, mid_grey_mat)])
    model_mesh = _add_bin_mesh(
        sc,
        os.path.join(mt, "refr_plane.bin"
                     if scene_name == "Refraction_Plane" else "model.bin"),
        [(main_mat, main_mat)])
    core_mesh = _add_bin_mesh(sc, os.path.join(mt, "core.bin"),
                              [(mid_grey_mat, mid_grey_mat)])
    subsurf_bar_mesh = _add_bin_mesh(
        sc, os.path.join(mt, "subsurf_bar.bin"),
        [(white_mat, white_mat), (dark_grey_mat, dark_grey_mat)])
    text_mesh = _add_bin_mesh(sc, os.path.join(mt, "text.bin"),
                              [(white_mat, white_mat)])
    two_sided_mesh = _add_bin_mesh(sc, os.path.join(mt, "two_sided.bin"),
                                   [(main_mat, two_sided_back)])

    open_floor = scene_name in ("Standard_DirLight", "Standard_SunLight",
                                "Standard_MoonLight", "Standard_HDRLight")
    if open_floor:
        env_mesh = _add_bin_mesh(
            sc, os.path.join(MESHES_DIR, "env_floor_sub.bin"),
            [(floor_mat, floor_mat), (dark_grey_mat, dark_grey_mat),
             (mid_grey_mat, mid_grey_mat)])
    else:
        env_mesh = _add_bin_mesh(
            sc, os.path.join(MESHES_DIR, "env_sub.bin"),
            [(floor_mat, floor_mat), (walls_mat, walls_mat),
             (dark_grey_mat, dark_grey_mat),
             (light_grey_mat, light_grey_mat),
             (mid_grey_mat, mid_grey_mat)])

    square_light_mesh = _add_bin_mesh(
        sc, os.path.join(mt, "square_light.bin"),
        [(square_light_mat, square_light_mat),
         (dark_grey_mat, dark_grey_mat)])
    disc_light_mesh = _add_bin_mesh(
        sc, os.path.join(mt, "disc_light.bin"),
        [(disc_light_mat, disc_light_mat), (dark_grey_mat, dark_grey_mat)])
    glassball_mesh = _add_bin_mesh(
        sc, os.path.join(mt, "glassball.bin"),
        [(glassball_mat0, glassball_mat0), (glassball_mat1, glassball_mat1)])
    box_red = _add_bin_mesh(sc, os.path.join(mt, "box.bin"),
                            [(glossy_red, glossy_red)])
    box_refr = _add_bin_mesh(sc, os.path.join(mt, "box.bin"),
                             [(refr_mat_flags, refr_mat_flags)])
    box_green = _add_bin_mesh(sc, os.path.join(mt, "box.bin"),
                              [(glossy_green, glossy_green)])

    # ---- instances (tests/test_scene.cpp:728-804) ----
    if scene_name == "Refraction_Plane":
        sc.add_instance(model_mesh)
    elif scene_name in ("Standard_GlassBall0", "Standard_GlassBall1"):
        sc.add_instance(glassball_mesh, _xf([1, 0, 0, 0, 0, 1, 0, 0,
                                             0, 0, 1, 0, 0, 0.05, 0, 1]))
    elif scene_name == "Ray_Flags":
        from ray_tpu.scene.visibility import (
            RAY_ALL, RAY_CAMERA, RAY_DIFFUSE, RAY_REFR, RAY_SHADOW,
            RAY_SPECULAR,
        )

        def box_xf(tx, ty, tz):
            return _xf([0.01, 0, 0, 0, 0, 0.05, 0, 0,
                        0, 0, 0.01, 0, tx, ty, tz, 1])

        sc.add_instance(box_red, box_xf(-0.05, 0.05, 0.0),
                        visibility=RAY_ALL & ~RAY_SHADOW)
        sc.add_instance(box_refr, box_xf(0.0, 0.051, 0.0),
                        visibility=RAY_ALL & ~RAY_SPECULAR)
        sc.add_instance(box_red, box_xf(0.05, 0.05, 0.0),
                        visibility=RAY_ALL & ~RAY_DIFFUSE)
        sc.add_instance(box_green, box_xf(-0.05, 0.05, -0.05),
                        visibility=RAY_ALL & ~RAY_CAMERA)
        sc.add_instance(box_green, box_xf(0.0, 0.05, -0.05),
                        visibility=RAY_ALL & ~RAY_REFR)
        sc.add_instance(box_green, box_xf(0.05, 0.05, -0.05))
    elif scene_name == "Two_Sided":
        sc.add_instance(two_sided_mesh, _xf([1, 0, 0, 0, 0, 1, 0, 0,
                                             0, 0, 1, 0, 0, 0.04, 0, 1]))
        sc.add_instance(base_mesh)
        sc.add_instance(text_mesh)
    else:
        sc.add_instance(model_mesh, _MODEL_XFORM)
        sc.add_instance(base_mesh)
        sc.add_instance(core_mesh)
        sc.add_instance(subsurf_bar_mesh)
        sc.add_instance(text_mesh)
    sc.add_instance(env_mesh)

    # ---- lights (tests/test_scene.cpp:797-964) ----
    if scene_name in ("Standard_MeshLights", "Refraction_Plane"):
        if scene_name != "Refraction_Plane":
            sc.add_instance(square_light_mesh)
        sc.add_instance(disc_light_mesh)
    elif scene_name in ("Standard", "Standard_SphereLight",
                        "Standard_InsideLight", "Standard_SpotLight",
                        "Standard_DOF0", "Standard_DOF1",
                        "Standard_GlassBall0", "Standard_GlassBall1",
                        "Standard_Clipped", "Two_Sided"):
        if scene_name == "Standard_SphereLight":
            sc.add_light(LightDesc(
                type=LightType.SPHERE, color=(7.95775,) * 3,
                position=(-0.436484, 0.187179, 0.204932), radius=0.05))
            x = _LINE_LIGHT_XFORM
            sc.add_light(LightDesc(
                type=LightType.LINE, color=(80.0,) * 3,
                position=_col(x, 3), axis_u=_col(x, 0), axis_v=_col(x, 1),
                radius=0.005, height=0.2592))
        elif scene_name == "Standard_InsideLight":
            sc.add_light(LightDesc(
                type=LightType.SPHERE, color=(2.53302956,) * 3,
                position=(0.0, 0.17, 0.0), radius=0.1))
        elif scene_name == "Standard_SpotLight":
            # reference stores desc.spot_blend^2 as the blend divisor
            # (SceneCPU.cpp:660, CoreRef.cpp:3364)
            sc.add_light(LightDesc(
                type=LightType.SPHERE, color=(10.1321182,) * 3,
                position=(-0.436484, 0.187179, 0.204932), radius=0.05,
                direction=(0.699538708, -0.130918920, -0.702499688),
                spot_size=45.0, spot_blend=0.15 * 0.15))
        else:
            import os as _os
            _only = _os.environ.get("RAY_TPU_ONLY_LIGHT", "")
            if _only != "disk":
                x = _RECT_LIGHT_XFORM
                sc.add_light(LightDesc(
                    type=LightType.RECT, color=(20.3718,) * 3,
                    position=_col(x, 3), axis_u=_col(x, 0), axis_v=_col(x, 2),
                    width=0.162, height=0.162))
            if _only != "rect":
                x = _DISK_LIGHT_XFORM
                sc.add_light(LightDesc(
                    type=LightType.DISK, color=(81.4873,) * 3,
                    position=_col(x, 3), axis_u=_col(x, 0), axis_v=_col(x, 2),
                    width=0.1296, height=0.1296))
    elif scene_name == "Standard_DirLight":
        # reference divides dir-light color by the disk solid angle
        # (pi*tan^2) inside AddLight (SceneCPU.cpp:603-610)
        angle = 10.0
        tan_half = math.tan(math.radians(angle) * 0.5)
        mul = 1.0 / (math.pi * tan_half * tan_half)
        sc.add_light(LightDesc(
            type=LightType.DIR, color=(12.0 * mul,) * 3,
            direction=(0.541675210, -0.541675210, -0.642787635),
            angle=angle))
    elif scene_name == "Ray_Flags":
        _flm = float(entry.get("flags_override", {}).get("light_mul", 1.0))
        sc.add_light(LightDesc(
            type=LightType.SPHERE, color=(0.0253302939 * _flm,) * 3,
            position=(-0.05, 0.2, 0.075), radius=0.0))
    # Standard_NoLight: nothing

    sc.set_environment((0.0, 0.0, 0.0))

    # ---- camera (tests/test_scene.cpp:233-301) ----
    cam_kw = dict(filter=PixelFilter.BOX)
    view_transform = ViewTransform.STANDARD
    if scene_name == "Standard_DirLight":
        view_transform = ViewTransform.FILMIC_HIGH_CONTRAST
    elif scene_name in ("Standard_SunLight", "Standard_MoonLight"):
        view_transform = ViewTransform.AGX
    if scene_name == "Refraction_Plane":
        cam_kw.update(origin=(-0.074711, 0.099348, -0.049506),
                      fwd=(0.725718915, 0.492017448, 0.480885535),
                      fov=45.1806)
    else:
        cam_kw.update(origin=(0.16149, 0.294997, 0.332965),
                      fwd=(-0.364128768, -0.555621922, -0.747458696),
                      fov=18.1806)
    if scene_name == "Standard_Clipped":
        cam_kw.update(clip_start=0.4, clip_end=0.5)
    if scene_name == "Standard_DOF0":
        cam_kw.update(sensor_height=0.018, focus_distance=0.1, fstop=0.1,
                      lens_blades=6, lens_rotation=math.radians(30.0),
                      lens_ratio=2.0)
    elif scene_name == "Standard_DOF1":
        cam_kw.update(sensor_height=0.018, focus_distance=0.4, fstop=0.1,
                      lens_blades=0, lens_rotation=math.radians(30.0),
                      lens_ratio=2.0)
    elif scene_name == "Standard_SunLight":
        cam_kw.update(exposure=-14.0)
    cam = make_camera(**cam_kw)

    # ---- pass settings (camera_desc_t depth defaults SceneBase.h:300-310,
    # test overrides tests/test_scene.cpp:281-295) ----
    ps = dict(max_diff_depth=4, max_spec_depth=8, max_refr_depth=8,
              max_transp_depth=8, max_total_depth=8, min_total_depth=4,
              regularize_alpha=0.0)
    if scene_name in ("Standard_GlassBall0", "Standard_GlassBall1"):
        ps.update(max_diff_depth=8, max_spec_depth=8, max_refr_depth=8,
                  max_total_depth=9)
    elif scene_name == "Ray_Flags":
        ps.update(regularize_alpha=0.1)
    settings = PassSettings(**ps)

    return sc, cam, settings, view_transform
