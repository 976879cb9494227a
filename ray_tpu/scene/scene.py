"""Scene container + finalize ("scene compile").

Imperative build API like the reference's ``SceneBase``
(SceneBase.h:371-516: AddTexture/AddMaterial/AddMesh/AddLight/
AddMeshInstance/SetEnvironment/Finalize) — but finalize emits a
:class:`SceneFlat`: one frozen pytree of dense arrays, the TPU-native
analogue of the reference's ``scene_data_t`` pointer bundle
(internal/Core.h:511).  Handles, freelists and sparse storages from the
reference (internal/SparseStorageCPU.h, internal/FreelistAlloc.cpp) have no
reason to exist here: scenes are compiled host-side in numpy and frozen.

Round-1 simplification: instances are flattened — vertices are transformed
to world space at finalize and a single world-space BVH is built (the
reference's two-level TLAS/BLAS, SceneCPU.cpp:928, becomes worthwhile once
instancing-heavy scenes land; tracked in docs/ROADMAP.md).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ray_tpu.scene.bvh import (
    build_bvh2,
    bvh_depth,
    pack_bvh_soa,
    pack_tri_soa,
    tri_bounds,
)
from ray_tpu.scene.camera import Camera
from ray_tpu.scene.lights import LightDesc, LightType, pack_lights
from ray_tpu.scene.materials import (
    MAT_FLAG_IMP_SAMPLE,
    MaterialDesc,
    ShadingNode,
    pack_materials,
)
from ray_tpu.scene.textures import TexturePacker


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneFlat:
    """Frozen, device-ready scene: every field is a dense array (or dict of
    dense arrays).  This is the single argument every render kernel takes."""

    # geometry (world space)
    vertices: Any        # (V, 3) f32
    normals: Any         # (V, 3) f32 shading normals
    uvs: Any             # (V, 2) f32
    tri_vidx: Any        # (T, 3) i32, in BVH leaf order
    tri_mat: Any         # (T, 2) i32 front/back material ids (-1 = none)
    tri_light: Any       # (T,) i32 light id for emissive tris (-1 = none)
    # acceleration structure: 1-D column dicts (TPU layout — see
    # scene/bvh.py pack_bvh_soa) plus root bounds
    bvh_soa: Any         # dict of (N,) columns
    tri_soa: Any         # dict of (T,) columns, leaf order
    root_lo: Any         # (3,) f32
    root_hi: Any         # (3,) f32
    # tables
    materials: Any       # dict of SoA columns (differentiable leaves)
    lights: Any          # dict of SoA columns
    textures: Any        # dict: flat texel buffer + records
    # environment
    env_col: Any         # (3,) f32 multiplier/color
    env_map: Any         # () i32 texture id (-1 = constant color)
    env_rotation: Any    # () f32 y-rotation, radians
    # env importance tables (scene/env.py); size-1 dummies when no map
    env_marginal_cdf: Any  # (H,) f32
    env_cond_cdf: Any      # (H*W,) f32 row-major
    env_pdf: Any           # (H*W,) f32 solid-angle pdf
    # hierarchical light tree (scene/light_tree.py); dummy rows when off
    light_tree: Any        # dict of (N,)/(N,3) node columns + per-light links
    # static metadata
    max_leaf: int = dataclasses.field(metadata=dict(static=True))
    num_lights: int = dataclasses.field(metadata=dict(static=True))
    env_light_index: int = dataclasses.field(metadata=dict(static=True))
    # traversal stack bound: actual BVH depth + margin (big memory win over a
    # fixed 48/64-slot stack at multi-megapixel wavefronts)
    stack_size: int = dataclasses.field(metadata=dict(static=True))
    # per-light (type, visible, doublesided, sky_portal) — static so kernels
    # can unroll over the light list with type-specialized code
    light_kinds: tuple = dataclasses.field(metadata=dict(static=True))
    # env importance-table dims (0 when no env map)
    env_tab_w: int = dataclasses.field(metadata=dict(static=True))
    env_tab_h: int = dataclasses.field(metadata=dict(static=True))
    # light-tree depth in edges; 0 = hierarchical NEE off (CDF picking)
    light_tree_depth: int = dataclasses.field(
        default=0, metadata=dict(static=True)
    )

    @property
    def num_tris(self) -> int:
        return int(self.tri_vidx.shape[0])


@dataclasses.dataclass
class _Mesh:
    vertices: np.ndarray
    normals: np.ndarray
    uvs: np.ndarray
    indices: np.ndarray
    tri_mat: np.ndarray  # (T,2) front/back material ids


class Scene:
    """Mutable scene builder."""

    def __init__(self):
        self._textures = TexturePacker()
        self._materials: list[MaterialDesc] = []
        self._meshes: list[_Mesh] = []
        self._instances: list[tuple[int, Optional[np.ndarray]]] = []
        self._lights: list[LightDesc] = []
        self.env_col = np.array([0.0, 0.0, 0.0], np.float32)
        self.env_map = -1
        self.env_rotation = 0.0
        self.camera: Optional[Camera] = None

    # -- resources ---------------------------------------------------------
    def add_texture(self, image, srgb: bool = False, generate_mips: bool = True) -> int:
        return self._textures.add(image, srgb=srgb, generate_mips=generate_mips)

    def add_material(self, desc: MaterialDesc) -> int:
        self._materials.append(desc)
        return len(self._materials) - 1

    def add_mesh(
        self,
        vertices,
        indices,
        normals=None,
        uvs=None,
        material: int = 0,
        back_material: Optional[int] = None,
        tri_materials=None,
    ) -> int:
        """Add an indexed triangle mesh.

        ``tri_materials``: optional (T, 2) per-triangle front/back material
        ids (the analogue of the reference's material groups,
        SceneBase.h:99 ``mat_group_desc_t``).
        """
        v = np.asarray(vertices, np.float32).reshape(-1, 3)
        idx = np.asarray(indices, np.int32).reshape(-1, 3)
        if normals is None:
            normals = compute_vertex_normals(v, idx)
        n = np.asarray(normals, np.float32).reshape(-1, 3)
        if uvs is None:
            uvs = np.zeros((v.shape[0], 2), np.float32)
        uv = np.asarray(uvs, np.float32).reshape(-1, 2)
        if tri_materials is not None:
            tm = np.asarray(tri_materials, np.int32).reshape(-1, 2)
        else:
            bm = material if back_material is None else back_material
            tm = np.tile(
                np.array([[material, bm]], np.int32), (idx.shape[0], 1)
            )
        assert tm.shape[0] == idx.shape[0]
        self._meshes.append(_Mesh(v, n, uv, idx, tm))
        return len(self._meshes) - 1

    def add_instance(self, mesh: int, xform=None) -> int:
        xf = None if xform is None else np.asarray(xform, np.float32).reshape(4, 4)
        self._instances.append((mesh, xf))
        return len(self._instances) - 1

    def add_light(self, desc: LightDesc) -> int:
        self._lights.append(desc)
        return len(self._lights) - 1

    def set_environment(self, color=(0, 0, 0), map_id: int = -1, rotation: float = 0.0):
        self.env_col = np.asarray(color, np.float32)
        self.env_map = int(map_id)
        self.env_rotation = float(rotation)

    def set_camera(self, cam: Camera):
        self.camera = cam

    def set_physical_sky(
        self,
        params=None,
        sun_direction=(0.3, 0.9, 0.2),
        sun_color=(20.0, 20.0, 20.0),
        env_res=(256, 128),
        add_sun_light: bool = True,
        sun_angle: float = 0.53,
    ):
        """Bake the procedural atmosphere to the environment map and add the
        sun as a directional light with transmittance-attenuated color — the
        analogue of Scene::Finalize's PrepareSkyEnvMap (SceneCPU.cpp:1017)
        plus the physical-sky sun registration (SceneCommon.cpp:314-327).

        ``sun_direction`` points *toward* the sun.  Returns the params used.
        """
        import jax.numpy as jnp

        from ray_tpu.render import sky as sky_mod
        from ray_tpu.scene.lights import LightDesc, LightType

        if params is None:
            params = sky_mod.AtmosphereParams()
        sd = np.asarray(sun_direction, np.float64)
        sd = sd / np.linalg.norm(sd)
        w, h = env_res
        # when the sun is a separate dir light, keep the disk out of the
        # bake (no double counting)
        img = np.asarray(
            sky_mod.bake_sky_env(
                params, sd, sun_color, width=w, height=h,
                include_sun_disk=not add_sun_light,
            )
        )
        tex = self.add_texture(img[..., :3], generate_mips=False)
        self.set_environment((1.0, 1.0, 1.0), map_id=tex)

        if add_sun_light:
            p = params.jnp_params()
            lut = sky_mod.build_transmittance_lut(p)
            r0 = jnp.asarray(p.planet_radius + p.viewpoint_height)
            T = np.asarray(
                sky_mod.lookup_transmittance(
                    p, lut, r0[None], jnp.asarray([sd[1]], jnp.float32)
                )
            )[0]
            sun_rad = np.asarray(sun_color, np.float64) * T
            # radiance over the solid angle of the disk
            ang = np.radians(sun_angle) * 0.5
            sun_rad = sun_rad / (np.pi * ang * ang)
            self.add_light(
                LightDesc(
                    type=LightType.DIR,
                    color=tuple(float(c) for c in sun_rad),
                    # LightDesc takes the direction the light travels
                    direction=tuple(float(-c) for c in sd),
                    angle=float(sun_angle),
                )
            )
        return params

    # -- finalize ----------------------------------------------------------
    def finalize(self, max_leaf: int = 4,
                 light_tree_min_lights: int = 5) -> SceneFlat:
        """Compile to a SceneFlat (the analogue of Scene::Finalize,
        SceneCPU.cpp:882: env light registration + BVH + light table)."""
        if not self._instances:
            for m in range(len(self._meshes)):
                self._instances.append((m, None))

        verts, norms, uvs, tris, tri_mat = [], [], [], [], []
        voffset = 0
        for mesh_id, xf in self._instances:
            m = self._meshes[mesh_id]
            v, n = m.vertices, m.normals
            if xf is not None:
                r = xf[:3, :3]
                t = xf[:3, 3]
                v = v @ r.T + t
                n_mat = np.linalg.inv(r).T
                n = n @ n_mat.T
                n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
            verts.append(v.astype(np.float32))
            norms.append(n.astype(np.float32))
            uvs.append(m.uvs)
            tris.append(m.indices + voffset)
            tri_mat.append(m.tri_mat)
            voffset += v.shape[0]

        vertices = np.concatenate(verts) if verts else np.zeros((3, 3), np.float32)
        normals = np.concatenate(norms) if norms else np.zeros((3, 3), np.float32)
        uv = np.concatenate(uvs) if uvs else np.zeros((3, 2), np.float32)
        tri_vidx = (
            np.concatenate(tris) if tris else np.array([[0, 1, 2]], np.int32)
        )
        tri_mats = (
            np.concatenate(tri_mat) if tri_mat else np.full((1, 2), -1, np.int32)
        )

        # BVH over world-space triangles; permute tri arrays to leaf order so
        # the traversal kernel indexes them directly (no extra indirection).
        lo, hi = tri_bounds(vertices, tri_vidx)
        bvh = build_bvh2(lo, hi, max_leaf=max_leaf)
        perm = bvh.prim_indices
        tri_vidx = tri_vidx[perm]
        tri_mats = tri_mats[perm]

        # emissive triangles with importance_sample → TRI lights
        # (the reference registers these during Finalize; SceneCPU.cpp:1214)
        light_descs = list(self._lights)
        tri_areas = {}
        tri_light = np.full(tri_vidx.shape[0], -1, np.int32)
        mats = self._materials if self._materials else [MaterialDesc()]
        for t in range(tri_vidx.shape[0]):
            mat_id = tri_mats[t, 0]
            if mat_id < 0 or mat_id >= len(mats):
                continue
            d = mats[mat_id]
            emissive = d.type == ShadingNode.EMISSIVE or (
                d.type == ShadingNode.PRINCIPLED
                and max(d.emission_color) * d.emission_strength > 0.0
            )
            if not (emissive and d.importance_sample):
                continue
            p = vertices[tri_vidx[t]]
            area = 0.5 * np.linalg.norm(
                np.cross(p[1] - p[0], p[2] - p[0])
            )
            if d.type == ShadingNode.EMISSIVE:
                col = np.asarray(d.base_color) * d.strength
            else:
                col = np.asarray(d.emission_color) * d.emission_strength
            li = len(light_descs)
            light_descs.append(
                LightDesc(
                    type=LightType.TRI,
                    color=tuple(col),
                    tri_index=int(t),
                    doublesided=d.two_sided,
                )
            )
            tri_areas[li] = float(area)
            tri_light[t] = li

        # implicit environment light when the env contributes
        # (reference SceneCPU.cpp:908-921)
        env_light_index = -1
        if float(np.max(self.env_col)) > 0.0 or self.env_map >= 0:
            env_light_index = len(light_descs)
            light_descs.append(
                LightDesc(type=LightType.ENV, color=tuple(self.env_col))
            )

        materials = pack_materials(self._materials)
        lights = pack_lights(light_descs, tri_areas)
        textures = self._textures.pack()

        # hierarchical light tree (USE_HIERARCHICAL_NEE analogue; reference
        # RebuildLightTree_nolock, SceneCPU.cpp:1214).  Below the threshold a
        # flux-proportional CDF pick has near-identical variance and skips
        # the per-bounce tree walks (importance evals cost arccos/atan2 at
        # wavefront scale) — a TPU-worthwhile trade the reference can't make
        # because its descent is per-ray scalar code either way.
        light_tree_depth = 0
        if len(light_descs) >= light_tree_min_lights:
            from ray_tpu.scene.light_tree import (
                build_light_tree,
                light_bounds_and_cones,
            )

            env_mean_lum = 1.0
            if self.env_map >= 0:
                img = self._textures.get_image(self.env_map)
                env_mean_lum = float(
                    np.mean(
                        0.212671 * img[..., 0]
                        + 0.715160 * img[..., 1]
                        + 0.072169 * img[..., 2]
                    )
                )
            bounds = light_bounds_and_cones(
                light_descs, vertices, tri_vidx, tri_areas,
                env_mean_lum=env_mean_lum,
            )
            light_tree, light_tree_depth = build_light_tree(bounds)
        else:
            light_tree = {
                "lo": np.zeros((1, 3), np.float32),
                "hi": np.zeros((1, 3), np.float32),
                "axis": np.zeros((1, 3), np.float32),
                "flux": np.zeros(1, np.float32),
                "omega_n": np.zeros(1, np.float32),
                "omega_e": np.zeros(1, np.float32),
                "left": np.full(1, -1, np.int32),
                "right": np.full(1, -1, np.int32),
                "parent": np.full(1, -1, np.int32),
                "side": np.zeros(1, np.int32),
                "leaf_node": np.zeros(max(len(light_descs), 1), np.int32),
            }

        # env importance tables (scene/env.py; reference builds a luminance
        # quadtree here instead — SceneCPU.cpp:1058 PrepareEnvMapQTree)
        if self.env_map >= 0:
            from ray_tpu.scene.env import build_env_cdf

            img = self._textures.get_image(self.env_map)
            env_marginal, env_cond, env_pdf = build_env_cdf(img)
            env_tab_h, env_tab_w = env_pdf.shape
            env_cond = env_cond.reshape(-1)
            env_pdf = env_pdf.reshape(-1)
        else:
            env_marginal = np.ones(1, np.float32)
            env_cond = np.ones(1, np.float32)
            env_pdf = np.full(1, 0.25 / np.pi, np.float32)
            env_tab_h = env_tab_w = 0

        dev = jax.tree_util.tree_map(jnp.asarray, {
            "vertices": vertices,
            "normals": normals,
            "uvs": uv,
            "tri_vidx": tri_vidx,
            "tri_mat": tri_mats,
            "tri_light": tri_light,
            "bvh_soa": pack_bvh_soa(bvh),
            "tri_soa": pack_tri_soa(vertices, tri_vidx),
            "root_lo": bvh.root_lo,
            "root_hi": bvh.root_hi,
            "materials": materials,
            "lights": lights,
            "textures": textures,
            "env_col": self.env_col,
            "env_map": np.int32(self.env_map),
            "env_rotation": np.float32(self.env_rotation),
            "env_marginal_cdf": env_marginal,
            "env_cond_cdf": env_cond,
            "env_pdf": env_pdf,
            "light_tree": light_tree,
        })
        return SceneFlat(
            **dev,
            max_leaf=max_leaf,
            num_lights=len(light_descs),
            env_light_index=env_light_index,
            stack_size=bvh_depth(bvh) + 4,
            light_kinds=tuple(
                (int(d.type), bool(d.visible), bool(d.doublesided),
                 bool(d.sky_portal))
                for d in light_descs
            ),
            env_tab_w=env_tab_w,
            env_tab_h=env_tab_h,
            light_tree_depth=light_tree_depth,
        )


def compute_vertex_normals(vertices: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Area-weighted smooth vertex normals."""
    p = vertices[indices]
    fn = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    out = np.zeros_like(vertices)
    for k in range(3):
        np.add.at(out, indices[:, k], fn)
    norm = np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
    return (out / norm).astype(np.float32)
