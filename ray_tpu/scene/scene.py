"""Scene container + finalize ("scene compile").

Imperative build API like the reference's ``SceneBase``
(SceneBase.h:371-516: AddTexture/AddMaterial/AddMesh/AddLight/
AddMeshInstance/SetEnvironment/Finalize) — but finalize emits a
:class:`SceneFlat`: one frozen pytree of dense arrays, the TPU-native
analogue of the reference's ``scene_data_t`` pointer bundle
(internal/Core.h:511).  Handles, freelists and sparse storages from the
reference (internal/SparseStorageCPU.h, internal/FreelistAlloc.cpp) have no
reason to exist here: scenes are compiled host-side in numpy and frozen.

Two finalize modes: 'flatten' pre-transforms instances to world space and
builds one BVH (+ the 8-wide layout for the TPU wavefront); 'tlas' builds
the reference-style two-level structure (SceneCPU.cpp:928) — shared
object-space BLAS per mesh + TLAS over instances — for instancing-heavy
scenes.  'auto' picks tlas iff some mesh is instanced more than once.
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
from ray_tpu.scene import lights as lights_mod
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
    # --- instancing (SURVEY §2.2 two-level TLAS/BLAS, SceneCPU.cpp:928) ---
    # 'flatten': world-space triangles, single BVH (fast path; Pallas-eligible)
    # 'tlas': shared object-space BLAS per mesh + TLAS over instances; the
    # node columns in bvh_soa hold TLAS then all BLAS in one code space.
    mode: str = dataclasses.field(
        default="flatten", metadata=dict(static=True)
    )
    # any instance with a non-default per-ray-type visibility mask?
    has_visibility: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    tri_vis: Any = None          # flatten: (T,) i32 visibility per leaf tri
    inst: Any = None             # tlas: dict of per-instance columns
    tri_light_local: Any = None  # tlas: (T,) i32 per-mesh emissive ordinal
    # --- shadow transparency (reference MATERIAL_SOLID_BIT,
    # SceneCPU.cpp:470-499 + shadow loop CoreRef.cpp:3160-3262) ---
    tri_solid: Any = None        # (T, 2) bool front/back side blocks shadows
    has_transparency: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    # packed per-triangle surface row (see _pack_tri_surf) — the one gather
    # a hit needs; object-space under TLAS instancing (col 28 is then the
    # per-mesh emissive ordinal, not a global light id)
    tri_surf: Any = None
    # static feature flags: let jit trace specialize away whole subsystems
    # (texture fetches, Mix resolution, normal mapping) the scene can't need
    has_textures: bool = dataclasses.field(
        default=True, metadata=dict(static=True)
    )
    has_mix: bool = dataclasses.field(
        default=True, metadata=dict(static=True)
    )
    has_normal_maps: bool = dataclasses.field(
        default=True, metadata=dict(static=True)
    )
    # any material carries a non-zero anisotropic_rotation (the tangent
    # rotation only matters then — ShadeRef.cpp:1362)
    has_aniso_rotation: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    # sorted tuple of ShadingNode types present — kernels specialize per
    # node-type set at trace time, the XLA analogue of the reference's
    # per-feature-define shader variants (scripts/compile_shaders.py:155+,
    # 212 compiled kernel permutations); node types are discrete data that
    # gradients never touch, so specializing on them is semantics-preserving
    mat_types: tuple = dataclasses.field(
        default=(0, 1, 2, 3, 4, 5, 6), metadata=dict(static=True)
    )

    @property
    def num_tris(self) -> int:
        return int(self.tri_vidx.shape[0])



def _bvh_soa_with_wide(bvh, tri_soa, tri_vis=None, min_tris: int = 256):
    """BVH2 columns + the 8-wide layout (scene/wbvh.py) for scenes past the
    Pallas-VMEM size — the XLA wavefront then pays one row gather per step
    for 8 children instead of 2."""
    out = pack_bvh_soa(bvh)
    if tri_soa["packed"].shape[0] > min_tris:
        from ray_tpu.scene.wbvh import build_wbvh

        wb = build_wbvh(bvh, tri_soa["packed"], tri_vis)
        out["wrows"] = wb["wrows"]
    return out


def _maybe_pack_binned(out, bvh, tri_soa, tri_vis):
    """Opt-in subtree slabs for the binned Pallas path — measured slower
    than the XLA machine (traverse_pallas.py section comment), so packed
    only on request (finalize(pallas_binned=True))."""
    from ray_tpu.ops.traverse_pallas import (
        CI, T_MAX_BVH, pack_binned_scene,
    )

    n_tris = tri_soa["p0x"].shape[0]
    if tri_vis is None and max(bvh.num_nodes, n_tris) > T_MAX_BVH:
        b = pack_binned_scene(bvh, tri_soa)
        if 2 <= b["slab_i"].shape[0] // CI <= 512:
            for k, v in b.items():
                out["binned_" + k] = v
    return out


# radial-tangent rotation: maps a local position to (-z, 0, x)
# (the reference's "rotate around Y by 90 degrees in 2d", ShadeRef.cpp:1357)
_R90 = np.array([[0.0, 0.0, -1.0],
                 [0.0, 0.0, 0.0],
                 [1.0, 0.0, 0.0]], np.float64)


def _pack_tri_surf(vertices, normals, uvs, tri_vidx, tri_mats, tri_solid,
                   tri_light, tangent_q=None, tangent_q0=None):
    """Pack per-triangle surface attributes into one (T, 41) f32 row so a
    hit needs a single row gather instead of ~14 separate ones (TPU row
    gathers near-serialize; see ops/gather.py).  Layout:
    p0 p1 p2 (9) | n0 n1 n2 (9) | uv0 uv1 uv2 (6) | mat_f mat_b (2) |
    solid_f solid_b (2) | light (1) | tanq (9) | tanq0 (3).  Int columns
    ride as exact f32 (< 2^24).

    ``tangent_q``/``tangent_q0``: per-triangle affine map turning the
    WORLD hit position into the reference's OBJECT-SPACE radial tangent
    (ShadeRef.cpp:1355-1358 computes it from P_local and transforms it by
    the instance inverse): tangent = Q·P + q0 with
    Q = (A⁻¹)ᵀ·R90·A⁻¹ and q0 = -(A⁻¹)ᵀ·R90·A⁻¹·b for instance
    transform x → A·x + b.  With identity instancing Q == R90, q0 == 0
    (the defaults)."""
    p = vertices[tri_vidx]            # (T, 3, 3)
    n = normals[tri_vidx]
    t = uvs[tri_vidx]                 # (T, 3, 2)
    T = tri_vidx.shape[0]
    if tangent_q is None:
        tangent_q = np.broadcast_to(_R90, (T, 3, 3))
    if tangent_q0 is None:
        tangent_q0 = np.zeros((T, 3), np.float64)
    return np.concatenate([
        p.reshape(T, 9).astype(np.float32),
        n.reshape(T, 9).astype(np.float32),
        t.reshape(T, 6).astype(np.float32),
        tri_mats.astype(np.float32),
        tri_solid.astype(np.float32),
        tri_light.astype(np.float32)[:, None],
        np.ascontiguousarray(tangent_q.reshape(T, 9)).astype(np.float32),
        np.ascontiguousarray(tangent_q0.reshape(T, 3)).astype(np.float32),
    ], axis=1)


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
    def add_texture(self, image, srgb: bool = False,
                    generate_mips: bool = True, compress: bool = False) -> int:
        """``compress``: store BC1-style 4×4 blocks (~9× smaller, lossy,
        non-differentiable) — the reference's use_tex_compression."""
        return self._textures.add(image, srgb=srgb,
                                  generate_mips=generate_mips,
                                  compress=compress)

    def add_material(self, desc: MaterialDesc) -> int:
        # Principled alpha expands into a Mix(Transparent, root) node tree
        # exactly like the reference (SceneCPU.cpp:285-334): alpha == 0 IS
        # the transparent node; otherwise Mix with strength = alpha (and
        # the alpha texture as the mix weight map), ior = 0 (no Fresnel).
        from ray_tpu.scene.materials import NO_TEXTURE, ShadingNode

        if desc.type == ShadingNode.PRINCIPLED and (
                desc.alpha != 1.0 or desc.alpha_texture != NO_TEXTURE):
            import dataclasses as _dc

            root = _dc.replace(desc, alpha=1.0, alpha_texture=NO_TEXTURE)
            self._materials.append(root)
            root_id = len(self._materials) - 1
            self._materials.append(MaterialDesc(
                type=ShadingNode.TRANSPARENT, base_color=(1.0, 1.0, 1.0)))
            transp_id = len(self._materials) - 1
            if desc.alpha == 0.0 and desc.alpha_texture == NO_TEXTURE:
                return transp_id
            self._materials.append(MaterialDesc(
                type=ShadingNode.MIX, strength=float(desc.alpha),
                base_texture=desc.alpha_texture, ior=0.0,
                mix_materials=(transp_id, root_id)))
            return len(self._materials) - 1
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

    def add_instance(self, mesh: int, xform=None, visibility: int = None) -> int:
        """Add a mesh instance (reference ``mesh_instance_desc_t``,
        SceneBase.h:135: transform + per-ray-type visibility bools).

        ``visibility``: bitmask from scene.visibility (RAY_CAMERA | ... );
        default = visible to every ray type.
        """
        from ray_tpu.scene.visibility import RAY_ALL

        xf = None if xform is None else np.asarray(xform, np.float32).reshape(4, 4)
        vis = RAY_ALL if visibility is None else int(visibility)
        self._instances.append((mesh, xf, vis))
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
        full_sky: bool = False,
        **sky_features,
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
                full=full_sky, **sky_features,
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
    def finalize(self, max_leaf: int | None = None,
                 light_tree_min_lights: int = 2,
                 instancing: str = "auto",
                 fast_build: bool = False,
                 spatial_splits: bool = False,
                 pallas_binned: bool = False) -> SceneFlat:
        """Compile to a SceneFlat (the analogue of Scene::Finalize,
        SceneCPU.cpp:882: env light registration + BVH + light table).

        ``instancing``: 'flatten' pre-transforms every instance to world
        space and builds one BVH (best traversal perf, Pallas-eligible —
        the right call for single-use meshes); 'tlas' builds the
        reference-style two-level structure (SceneCPU.cpp:928
        RebuildTLAS_nolock): one shared object-space BLAS per mesh + a TLAS
        over instance AABBs — the memory-scaling choice for heavy
        instancing.  'auto' picks 'tlas' iff some mesh is instanced more
        than once.

        ``max_leaf`` defaults per structure: 8 for the flatten/wide path
        (a wide-BVH leaf visit costs one row gather regardless of count —
        the reference's min_prims_in_leaf is also 8, Core.h:241), 4 for
        the two-level TLAS path (binary leaf loops pay per slot).  BVHs
        are built with fat leaves (never split below max_leaf) — measured
        4.3× faster tracing at 437k tris than the classic per-triangle
        SAH leaf cost (scripts/exp_leaf.py).

        ``pallas_binned``: opt-in subtree-slab tables routing big flatten
        scenes through the binned Pallas kernel (bit-exact; measured
        slower than the XLA machine — ops/traverse_pallas.py).

        ``spatial_splits``: SBVH reference splitting for scenes with long
        thin / diagonally-overlapping triangles (the reference's
        BVHSplit.h:20 spatial path).  Duplicated leaf references are
        deduped before TRI-light registration so emissive flux is counted
        once.
        """
        from ray_tpu.scene.visibility import RAY_ALL

        if not self._instances:
            for m in range(len(self._meshes)):
                self._instances.append((m, None, RAY_ALL))
        has_vis = any(v != RAY_ALL for _, _, v in self._instances)

        if instancing == "auto":
            ids = [i[0] for i in self._instances]
            instancing = "tlas" if len(ids) != len(set(ids)) else "flatten"
        assert instancing in ("flatten", "tlas"), instancing
        if instancing == "tlas":
            return self._finalize_tlas(
                max_leaf if max_leaf is not None else 4,
                light_tree_min_lights, has_vis, fast_build,
                spatial_splits=spatial_splits,
            )
        return self._finalize_flatten(
            max_leaf if max_leaf is not None else 8,
            light_tree_min_lights, has_vis, fast_build,
            spatial_splits=spatial_splits, pallas_binned=pallas_binned,
        )

    def _material_solidity(self) -> np.ndarray:
        """Per-material shadow solidity: True iff the Mix DAG below the
        material contains no TRANSPARENT leaf (reference MATERIAL_SOLID_BIT
        assignment, SceneCPU.cpp:470-499)."""
        mats = self._materials if self._materials else [MaterialDesc()]
        solid = np.ones(len(mats), np.bool_)
        for i, d in enumerate(mats):
            stack = [i]
            seen = set()
            while stack:
                j = stack.pop()
                if j < 0 or j >= len(mats) or j in seen:
                    continue
                seen.add(j)
                m = mats[j]
                if m.type == ShadingNode.TRANSPARENT:
                    solid[i] = False
                    break
                if m.type == ShadingNode.MIX:
                    stack.extend(m.mix_materials)
        return solid

    def _tri_solidity(self, tri_mats: np.ndarray) -> np.ndarray:
        """(T, 2) per-side shadow-blocker flags from leaf-order materials
        (missing material = solid, like the reference's 0xffff back_mi)."""
        solid = self._material_solidity()
        out = np.ones(tri_mats.shape, np.bool_)
        valid = (tri_mats >= 0) & (tri_mats < solid.shape[0])
        out[valid] = solid[tri_mats[valid]]
        return out

    def _emissive_light_of(self, mat_id: int):
        """TRI-light registration rule (SceneCPU.cpp:1214): returns
        (radiance color, two_sided) for emissive importance-sampled
        materials, else None."""
        mats = self._materials if self._materials else [MaterialDesc()]
        if mat_id < 0 or mat_id >= len(mats):
            return None
        d = mats[mat_id]
        emissive = d.type == ShadingNode.EMISSIVE or (
            d.type == ShadingNode.PRINCIPLED
            and max(d.emission_color) * d.emission_strength > 0.0
        )
        if not (emissive and d.importance_sample):
            return None
        if d.type == ShadingNode.EMISSIVE:
            col = np.asarray(d.base_color) * d.strength
        else:
            col = np.asarray(d.emission_color) * d.emission_strength
        return col, d.two_sided

    def _finalize_flatten(self, max_leaf, light_tree_min_lights, has_vis,
                          fast_build=False, spatial_splits=False,
                          pallas_binned=False):
        verts, norms, uvs, tris, tri_mat, tri_vis = [], [], [], [], [], []
        tan_q, tan_q0 = [], []
        voffset = 0
        for mesh_id, xf, vis in self._instances:
            m = self._meshes[mesh_id]
            v, n = m.vertices, m.normals
            nt = m.indices.shape[0]
            if xf is not None:
                r = xf[:3, :3]
                t = xf[:3, 3]
                v = v @ r.T + t
                rinv = np.linalg.inv(np.asarray(r, np.float64))
                n_mat = rinv.T
                n = n @ n_mat.T
                n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
                # object-space radial tangent as an affine map of the WORLD
                # hit point (see _pack_tri_surf): tangent = Q·P + q0
                q = n_mat @ _R90 @ rinv
                q0 = -(q @ np.asarray(t, np.float64))
            else:
                q = _R90
                q0 = np.zeros(3, np.float64)
            tan_q.append(np.broadcast_to(q, (nt, 3, 3)))
            tan_q0.append(np.broadcast_to(q0, (nt, 3)))
            verts.append(v.astype(np.float32))
            norms.append(n.astype(np.float32))
            uvs.append(m.uvs)
            tris.append(m.indices + voffset)
            tri_mat.append(m.tri_mat)
            tri_vis.append(np.full(m.indices.shape[0], vis, np.int32))
            voffset += v.shape[0]
        tangent_q = (np.concatenate(tan_q) if tan_q
                     else np.broadcast_to(_R90, (1, 3, 3)))
        tangent_q0 = (np.concatenate(tan_q0) if tan_q0
                      else np.zeros((1, 3), np.float64))

        vertices = np.concatenate(verts) if verts else np.zeros((3, 3), np.float32)
        normals = np.concatenate(norms) if norms else np.zeros((3, 3), np.float32)
        uv = np.concatenate(uvs) if uvs else np.zeros((3, 2), np.float32)
        tri_vidx = (
            np.concatenate(tris) if tris else np.array([[0, 1, 2]], np.int32)
        )
        tri_mats = (
            np.concatenate(tri_mat) if tri_mat else np.full((1, 2), -1, np.int32)
        )
        tri_viss = (
            np.concatenate(tri_vis) if tri_vis
            else np.full(1, 0x7fffffff, np.int32)
        )

        # BVH over world-space triangles; permute tri arrays to leaf order so
        # the traversal kernel indexes them directly (no extra indirection).
        lo, hi = tri_bounds(vertices, tri_vidx)
        if fast_build:
            from ray_tpu.scene.hlbvh import build_hlbvh

            bvh = build_hlbvh(lo, hi, max_leaf=max_leaf)
        elif spatial_splits:
            bvh = build_bvh2(lo, hi, max_leaf=max_leaf, fat_leaves=True,
                             spatial_splits=True,
                             tri_verts=vertices[tri_vidx])
        else:
            bvh = build_bvh2(lo, hi, max_leaf=max_leaf, fat_leaves=True)
        perm = bvh.prim_indices
        tri_vidx = tri_vidx[perm]
        tri_mats = tri_mats[perm]
        tri_viss = tri_viss[perm]
        tangent_q = tangent_q[perm]
        tangent_q0 = tangent_q0[perm]

        # emissive triangles with importance_sample → TRI lights
        # (the reference registers these during Finalize; SceneCPU.cpp:1214)
        light_descs = list(self._lights)
        tri_areas = {}
        tri_light = np.full(tri_vidx.shape[0], -1, np.int32)
        seen_orig = {}  # original tri id -> light index (SBVH dup dedupe)
        for t in range(tri_vidx.shape[0]):
            em = self._emissive_light_of(int(tri_mats[t, 0]))
            if em is None:
                continue
            orig_id = int(perm[t])
            if orig_id in seen_orig:
                tri_light[t] = seen_orig[orig_id]
                continue
            col, two_sided = em
            p = vertices[tri_vidx[t]]
            area = 0.5 * np.linalg.norm(np.cross(p[1] - p[0], p[2] - p[0]))
            li = len(light_descs)
            light_descs.append(
                LightDesc(
                    type=LightType.TRI,
                    color=tuple(col),
                    tri_index=int(t),
                    doublesided=two_sided,
                    tri_verts=np.asarray(p, np.float32),
                )
            )
            tri_areas[li] = float(area)
            tri_light[t] = li
            seen_orig[orig_id] = li

        common = self._pack_common(
            light_descs, tri_areas, vertices, tri_vidx, light_tree_min_lights
        )
        dev = jax.tree_util.tree_map(jnp.asarray, {
            "vertices": vertices,
            "normals": normals,
            "uvs": uv,
            "tri_vidx": tri_vidx,
            "tri_mat": tri_mats,
            "tri_light": tri_light,
            "tri_vis": tri_viss,
            "tri_solid": self._tri_solidity(tri_mats),
            "tri_surf": _pack_tri_surf(
                vertices, normals, uv, tri_vidx, tri_mats,
                self._tri_solidity(tri_mats), tri_light,
                tangent_q=tangent_q, tangent_q0=tangent_q0,
            ),
            "bvh_soa": (lambda soa: _maybe_pack_binned(
                soa, bvh, pack_tri_soa(vertices, tri_vidx),
                tri_viss if has_vis else None) if pallas_binned else soa)(
                _bvh_soa_with_wide(
                    bvh, pack_tri_soa(vertices, tri_vidx),
                    tri_viss if has_vis else None,
                )
            ),
            "tri_soa": pack_tri_soa(vertices, tri_vidx),
            "root_lo": bvh.root_lo,
            "root_hi": bvh.root_hi,
            **common["dev"],
        })
        return SceneFlat(
            **dev,
            max_leaf=max_leaf,
            stack_size=bvh_depth(bvh) + 4,
            mode="flatten",
            has_visibility=has_vis,
            has_transparency=not bool(self._material_solidity().all()),
            inst=None,
            tri_light_local=None,
            **common["static"],
        )

    def _finalize_tlas(self, max_leaf, light_tree_min_lights, has_vis,
                       fast_build=False, spatial_splits=False):
        """Two-level compile: per-mesh object-space BLAS + TLAS over
        instances, all nodes merged into one code space (TLAS rows first;
        see ops/traverse.py _traverse_tlas)."""
        from ray_tpu.scene.bvh import (
            LEAF_COUNT_BITS, LEAF_COUNT_MASK, pack_node_columns,
        )
        from ray_tpu.ops.traverse import INST_LEAF_FLAG

        meshes = self._meshes
        assert meshes, "tlas mode needs at least one mesh"

        # --- per-mesh BLAS (shared by all instances of the mesh) ---
        blas = [None] * len(meshes)
        mesh_used = sorted({m for m, _, _ in self._instances})
        if fast_build:
            from ray_tpu.scene.hlbvh import build_hlbvh as _build
        else:
            _build = build_bvh2
        for mi in mesh_used:
            m = meshes[mi]
            lo, hi = tri_bounds(m.vertices, m.indices)
            if fast_build:
                blas[mi] = _build(lo, hi, max_leaf=max_leaf)
            elif spatial_splits:
                blas[mi] = _build(lo, hi, max_leaf=max_leaf, fat_leaves=True,
                                  spatial_splits=True,
                                  tri_verts=m.vertices[m.indices])
            else:
                blas[mi] = _build(lo, hi, max_leaf=max_leaf, fat_leaves=True)

        # --- concatenated object-space geometry in BLAS leaf order ---
        verts, norms, uvs, tris, tri_mat = [], [], [], [], []
        v_off, t_off = 0, 0
        tri_base = {}
        mesh_emissive = {}  # mesh -> [(leaf_local_tri, col, two_sided)]
        tri_light_local_parts = []
        for mi in mesh_used:
            m = meshes[mi]
            b = blas[mi]
            perm = b.prim_indices
            verts.append(m.vertices)
            norms.append(m.normals)
            uvs.append(m.uvs)
            tris.append(m.indices[perm] + v_off)
            tri_mat.append(m.tri_mat[perm])
            tri_base[mi] = t_off
            # per-mesh emissive ordinals (light id = inst light_base + ordinal)
            local = np.full(perm.shape[0], -1, np.int32)
            em_list = []
            seen_orig = {}  # original tri id -> ordinal (SBVH dup dedupe)
            for t in range(perm.shape[0]):
                em = self._emissive_light_of(int(m.tri_mat[perm[t], 0]))
                if em is None:
                    continue
                orig_id = int(perm[t])
                if orig_id in seen_orig:
                    local[t] = seen_orig[orig_id]
                    continue
                local[t] = len(em_list)
                seen_orig[orig_id] = local[t]
                em_list.append((t, em[0], em[1]))
            mesh_emissive[mi] = em_list
            tri_light_local_parts.append(local)
            v_off += m.vertices.shape[0]
            t_off += perm.shape[0]

        vertices = np.concatenate(verts)
        normals = np.concatenate(norms)
        uv = np.concatenate(uvs)
        tri_vidx = np.concatenate(tris)
        tri_mats = np.concatenate(tri_mat)
        tri_light_local = np.concatenate(tri_light_local_parts)
        assert tri_vidx.shape[0] < (1 << 24), "tlas mode caps at 16M tris"

        # --- instance transforms + world AABBs ---
        n_inst = len(self._instances)
        fwd = np.zeros((n_inst, 3, 4), np.float64)   # world-from-object
        inv = np.zeros((n_inst, 3, 4), np.float64)   # object-from-world
        inst_lo = np.zeros((n_inst, 3), np.float32)
        inst_hi = np.zeros((n_inst, 3), np.float32)
        inst_vis = np.zeros(n_inst, np.int32)
        for i, (mi, xf, vis) in enumerate(self._instances):
            A = np.eye(3) if xf is None else np.asarray(xf, np.float64)[:3, :3]
            b = np.zeros(3) if xf is None else np.asarray(xf, np.float64)[:3, 3]
            Ainv = np.linalg.inv(A)
            fwd[i, :, :3], fwd[i, :, 3] = A, b
            inv[i, :, :3], inv[i, :, 3] = Ainv, -Ainv @ b
            rl, rh = blas[mi].root_lo, blas[mi].root_hi
            corners = np.array(
                [[rl[0] if c & 1 else rh[0],
                  rl[1] if c & 2 else rh[1],
                  rl[2] if c & 4 else rh[2]] for c in range(8)]
            )
            wc = corners @ A.T + b
            inst_lo[i] = wc.min(0).astype(np.float32)
            inst_hi[i] = wc.max(0).astype(np.float32)
            inst_vis[i] = vis

        # --- TLAS over instance AABBs (one instance per leaf) ---
        tlas = build_bvh2(inst_lo, inst_hi, max_leaf=1, use_native="never")
        n_tlas = tlas.num_nodes

        def retag_tlas(code):
            if code >= 0:
                return code  # TLAS-internal: stays a low index
            v = -code - 1
            first, count = v >> LEAF_COUNT_BITS, v & LEAF_COUNT_MASK
            if count == 0:
                return -1  # empty leaf: decodes as 0-count tri leaf (no-op)
            assert count == 1
            return -((INST_LEAF_FLAG | int(tlas.prim_indices[first])) + 1)

        tlas_child = np.vectorize(retag_tlas)(tlas.child).astype(np.int32)

        # --- merge node arrays: TLAS rows, then each BLAS with offsets ---
        node_base = {}
        all_lo = [tlas.child_lo]
        all_hi = [tlas.child_hi]
        all_child = [tlas_child]
        base = n_tlas
        for mi in mesh_used:
            b = blas[mi]
            node_base[mi] = base
            c = b.child
            internal = c >= 0
            v = -c - 1
            first = (v >> LEAF_COUNT_BITS) + tri_base[mi]
            count = v & LEAF_COUNT_MASK
            leaf_new = -(((first << LEAF_COUNT_BITS) | count) + 1)
            all_child.append(
                np.where(internal, c + base,
                         np.where(count > 0, leaf_new, -1)).astype(np.int32)
            )
            all_lo.append(b.child_lo)
            all_hi.append(b.child_hi)
            base += b.num_nodes
        nodes_soa = pack_node_columns(
            np.concatenate(all_lo), np.concatenate(all_hi),
            np.concatenate(all_child),
        )

        # wide unified two-level table (scene/wbvh.py build_wtlas) for
        # scenes past the Pallas-VMEM size — one row gather per step
        if tri_vidx.shape[0] > 256:
            from ray_tpu.scene.wbvh import build_wtlas, finish_wtlas

            wt, mesh_root, wbase = build_wtlas(
                tlas, tlas.prim_indices, inv.astype(np.float32), inst_vis,
                [blas[mi] for mi in mesh_used], mesh_used, tri_base,
                pack_tri_soa(vertices, tri_vidx)["packed"], max_leaf,
            )
            finish_wtlas(wt, [mi for mi, _, _ in self._instances],
                         mesh_root, wbase)
            nodes_soa["wrows_tlas"] = wt["wrows_tlas"]
            nodes_soa["winst_base"] = np.int32(wbase)

        # --- per-instance columns for the traversal + shading transforms ---
        inst_cols = {"vis": inst_vis}
        inst_cols["blas_root"] = np.array(
            [node_base[mi] for mi, _, _ in self._instances], np.int32
        )
        for r in range(3):
            for c in range(3):
                inst_cols[f"inv{r}{c}"] = inv[:, r, c].astype(np.float32)
                inst_cols[f"m{r}{c}"] = fwd[:, r, c].astype(np.float32)
        for ax, name in enumerate("xyz"):
            inst_cols[f"invt{name}"] = inv[:, ax, 3].astype(np.float32)
            inst_cols[f"mt{name}"] = fwd[:, ax, 3].astype(np.float32)

        # --- per-instance TRI lights from emissive mesh triangles ---
        light_descs = list(self._lights)
        tri_areas = {}
        light_base = np.zeros(n_inst, np.int32)
        for i, (mi, xf, vis) in enumerate(self._instances):
            light_base[i] = len(light_descs)
            A, b = fwd[i, :, :3], fwd[i, :, 3]
            for t_local, col, two_sided in mesh_emissive[mi]:
                perm = blas[mi].prim_indices
                p_obj = meshes[mi].vertices[meshes[mi].indices[perm[t_local]]]
                p = (p_obj @ A.T + b).astype(np.float32)
                area = 0.5 * np.linalg.norm(
                    np.cross(p[1] - p[0], p[2] - p[0])
                )
                li = len(light_descs)
                light_descs.append(
                    LightDesc(
                        type=LightType.TRI,
                        color=tuple(np.asarray(col, np.float64)),
                        tri_index=int(tri_base[mi] + t_local),
                        doublesided=two_sided,
                        tri_verts=p,
                    )
                )
                tri_areas[li] = float(area)
        inst_cols["light_base"] = light_base

        common = self._pack_common(
            light_descs, tri_areas, vertices, tri_vidx, light_tree_min_lights
        )
        max_blas_depth = max(bvh_depth(blas[mi]) for mi in mesh_used)
        dev = jax.tree_util.tree_map(jnp.asarray, {
            "vertices": vertices,
            "normals": normals,
            "uvs": uv,
            "tri_vidx": tri_vidx,
            "tri_mat": tri_mats,
            "tri_light": np.full(tri_vidx.shape[0], -1, np.int32),
            "tri_light_local": tri_light_local,
            "tri_solid": self._tri_solidity(tri_mats),
            "tri_surf": _pack_tri_surf(
                vertices, normals, uv, tri_vidx, tri_mats,
                self._tri_solidity(tri_mats), tri_light_local,
            ),
            "bvh_soa": nodes_soa,
            "tri_soa": pack_tri_soa(vertices, tri_vidx),
            "root_lo": tlas.root_lo,
            "root_hi": tlas.root_hi,
            "inst": inst_cols,
            **common["dev"],
        })
        return SceneFlat(
            **dev,
            max_leaf=max_leaf,
            stack_size=bvh_depth(tlas) + max_blas_depth + 6,
            mode="tlas",
            has_visibility=has_vis,
            has_transparency=not bool(self._material_solidity().all()),
            tri_vis=None,
            **common["static"],
        )

    def _pack_common(self, light_descs, tri_areas, vertices, tri_vidx,
                     light_tree_min_lights):
        """Mode-independent tail of Finalize: env light + material/light/
        texture tables + light tree + env importance tables."""
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

        return {
            "dev": {
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
            },
            "static": {
                "num_lights": len(light_descs),
                "env_light_index": env_light_index,
                # feature flags let jit drop whole subsystems at trace time
                "has_textures": len(self._textures.num_mips) > 0,
                "has_mix": any(
                    d.type == ShadingNode.MIX for d in self._materials
                ),
                "has_normal_maps": any(
                    d.normal_map >= 0 for d in self._materials
                ),
                "has_aniso_rotation": any(
                    d.anisotropic_rotation != 0.0 for d in self._materials
                ),
                "mat_types": tuple(
                    sorted({int(d.type) for d in self._materials})
                ) or (ShadingNode.DIFFUSE,),
                "light_kinds": tuple(
                    (int(d.type), lights_mod.effective_visible(d),
                     bool(d.doublesided), bool(d.sky_portal))
                    for d in light_descs
                ),
                "env_tab_w": env_tab_w,
                "env_tab_h": env_tab_h,
                "light_tree_depth": light_tree_depth,
            },
        }


def compute_vertex_normals(vertices: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Area-weighted smooth vertex normals."""
    p = vertices[indices]
    fn = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    out = np.zeros_like(vertices)
    for k in range(3):
        np.add.at(out, indices[:, k], fn)
    norm = np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
    return (out / norm).astype(np.float32)
