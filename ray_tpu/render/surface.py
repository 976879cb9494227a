"""Hit → differentiable surface attributes + material resolution.

Mirrors the first half of the reference's ``ShadeSurface``
(internal/ShadeRef.cpp:1174-1420): barycentric interpolation of shading
normal/UVs, geometric plane normal, backface flip + back-material select,
radial tangent frame, Mix-node stochastic resolution and normal mapping —
all recomputed from the live scene arrays so gradients flow to vertices,
normals and textures ("attached evaluation" over the detached hit record).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ray_tpu.ops.gather import read_packed
from ray_tpu.ops.linalg import (
    cross,
    dot,
    normalize,
    safe_div_pos,
    safe_normalize,
)
from ray_tpu.render.bsdf.microfacet import fresnel_dielectric_cos
from ray_tpu.scene.materials import MAT_FLAG_MIX_ADD, ShadingNode
from ray_tpu.scene.textures import sample_bilinear, texture_lod

MAX_MIX_DEPTH = 4  # Mix nodes may nest; resolution loop is unrolled this deep


class Surface(NamedTuple):
    """Analogue of the reference's ``surface_t`` (internal/CoreRef.h:108)."""

    P: jnp.ndarray        # (R, 3) hit position
    N: jnp.ndarray        # (R, 3) shading normal (flipped to front side)
    plane_N: jnp.ndarray  # (R, 3) geometric normal (flipped)
    T: jnp.ndarray        # (R, 3)
    B: jnp.ndarray        # (R, 3)
    uv: jnp.ndarray       # (R, 2)
    backfacing: jnp.ndarray  # (R,) bool
    tri_area: jnp.ndarray    # (R,) world-space triangle area
    lod_base: jnp.ndarray    # (R,) 0.5·log2(ta/pa) cone-LOD term (ShadeRef.cpp:1282)
    # UV-space direction of the ray-cone footprint's MAJOR axis per unit
    # world length (the view direction projected into the surface, mapped
    # through the triangle's world→UV Jacobian) and its elongation factor
    # 1/|cosθ| - 1 beyond the isotropic width — the ellipse the
    # anisotropic filter (scene.textures.sample_bilinear aniso path) keys
    # off.  Capability analogue of CoreRef.h:465-474 SampleAnisotropic.
    duv_major_unit: jnp.ndarray  # (R, 2)
    aniso_elong: jnp.ndarray     # (R,)
    # raw (unorthonormalized) radial tangent, kept so the frame can be
    # rebuilt after normal mapping / per-material tangent rotation
    raw_tangent: jnp.ndarray     # (R, 3)


_INST_XFORM_COLS = (
    "m00", "m01", "m02", "mtx", "m10", "m11", "m12", "mty",
    "m20", "m21", "m22", "mtz",
    "inv00", "inv01", "inv02", "inv10", "inv11", "inv12",
    "inv20", "inv21", "inv22", "invtx", "invtz",
)


def fetch_inst_cols(inst, ii, names=_INST_XFORM_COLS):
    """All per-instance transform columns for a lane's instance id in ONE
    packed read (one-hot matmul for <=128 instances).  Column-by-column []
    gathers each cost a separate ~3-4 ms gather instruction inside the
    bounce scan (r5 profile: ~6 of the top ops were single-column inst
    reads sharing one index)."""
    from ray_tpu.ops.gather import read_packed

    vals = read_packed([inst[n] for n in names], ii)
    return dict(zip(names, vals))


def _inst_xform_point(cols, p):
    """World-from-object point transform from prefetched per-lane columns
    (:func:`fetch_inst_cols`)."""
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    return jnp.stack([
        cols["m00"] * x + cols["m01"] * y + cols["m02"] * z + cols["mtx"],
        cols["m10"] * x + cols["m11"] * y + cols["m12"] * z + cols["mty"],
        cols["m20"] * x + cols["m21"] * y + cols["m22"] * z + cols["mtz"],
    ], axis=-1)


def _inst_xform_normal(cols, n):
    """Normal transform = (A⁻¹)ᵀ — reusing the inverse columns transposed
    (reference mesh_instance_t.inv_xform, internal/Core.h:384)."""
    x, y, z = n[:, 0], n[:, 1], n[:, 2]
    return jnp.stack([
        cols["inv00"] * x + cols["inv10"] * y + cols["inv20"] * z,
        cols["inv01"] * x + cols["inv11"] * y + cols["inv21"] * z,
        cols["inv02"] * x + cols["inv12"] * y + cols["inv22"] * z,
    ], axis=-1)


def hit_light_id(scene, prim, inst=None, row=None):
    """Light id of an emissive hit triangle (-1 if not a light).  Under TLAS
    instancing the id is per-(instance, triangle): the instance's light base
    plus the triangle's per-mesh emissive ordinal (tri_surf col 28 holds
    the local ordinal in tlas mode, the global id in flatten mode)."""
    if row is None:
        row = fetch_tri_row(scene, prim)
    ids = row["light"].astype(jnp.int32)
    if scene.mode == "tlas":
        from ray_tpu.ops.gather import read_rows
        base = read_rows(scene.inst["light_base"], jnp.maximum(inst, 0))
        return jnp.where((ids >= 0) & (inst >= 0), base + ids, -1)
    return ids


# named pieces of the packed (T, 41) tri_surf row (scene._pack_tri_surf):
# p0 p1 p2 | n0 n1 n2 | uv0 uv1 uv2 | mat_f mat_b | solid_f solid_b |
# light | tanq tanq0 (affine world→object-radial-tangent map)
TRI_PIECES = {
    "p0": (0, 3), "p1": (3, 6), "p2": (6, 9),
    "n0": (9, 12), "n1": (12, 15), "n2": (15, 18),
    "uv0": (18, 20), "uv1": (20, 22), "uv2": (22, 24),
    "mat_f": (24, 25), "mat_b": (25, 26),
    "solid_f": (26, 27), "solid_b": (27, 28),
    "light": (28, 29),
    "tanq": (29, 38), "tanq0": (38, 41),
}


def fetch_tri_pieces(table, prim, keys, onehot_max=128):
    """Per-hit reads of named pieces of a packed (T, C) row table.

    Small tables (T ≤ 128) read as one-hot MXU matmuls (VJP is also a
    matmul, no scatter); larger tables read as ONE row-span gather — see
    the in-branch note on why per-column takes are pathological inside
    the bounce scan.  Returns {key: (R, k) or (R,)} — scalar pieces
    (k == 1) are squeezed.
    """
    i = jnp.maximum(prim, 0)
    T = table.shape[0]
    out = {}
    # Columns consumed as integers downstream (material/light ids): round
    # before callers .astype(int32) so a value that lands at x-eps does not
    # truncate to x-1 and select the wrong material/light.
    int_keys = ("mat_f", "mat_b", "solid_f", "solid_b", "light")
    if T <= onehot_max:
        from ray_tpu.ops.gather import _EXACT, one_hot_f32

        oh = one_hot_f32(i, T)
        for k in keys:
            a, b = TRI_PIECES[k]
            v = jnp.dot(oh, table[:, a:b],
                        preferred_element_type=jnp.float32,
                        precision=_EXACT)
            if k in int_keys:
                v = jnp.round(v)
            out[k] = v[:, 0] if b - a == 1 else v
    else:
        # ONE row-span gather for all requested pieces.  Inside the bounce
        # scan, each gather *instruction* costs ~2-3 ms per 518k-lane index
        # list regardless of row width (the per-column formulation paid
        # that ~20x per bounce — the dominant colonnade shade cost, r5
        # profile); the old "per-column takes beat the row gather" note
        # measured the ops OUTSIDE lax.scan, where XLA fuses the takes into
        # one fast gather — inside the loop they stay separate and slow.
        a_min = min(TRI_PIECES[k][0] for k in keys)
        b_max = max(TRI_PIECES[k][1] for k in keys)
        rows = table[:, a_min:b_max][i]
        for k in keys:
            a, b = TRI_PIECES[k]
            v = rows[:, a - a_min:b - a_min]
            out[k] = v[:, 0] if b - a == 1 else v
    return out


_DEFAULT_KEYS = tuple(k for k in TRI_PIECES if k not in ("tanq", "tanq0"))


def fetch_tri_row(scene, prim, keys=None):
    """Per-hit surface attributes as a dict of named pieces (see
    ``TRI_PIECES``).  Gradients w.r.t. geometry flow through
    ``scene.tri_surf``.  ``keys``: subset to fetch (default: everything
    but the tangent map, which compute_surface fetches on demand)."""
    return fetch_tri_pieces(
        scene.tri_surf, prim, _DEFAULT_KEYS if keys is None else keys
    )


def compute_surface(scene, prim, u, v, backface, ro, rd, t, inst=None,
                    row=None):
    """Interpolate differentiable surface attributes for hit triangles.

    ``inst``: (R,) instance indices under TLAS instancing — vertex data is
    object-space and gets transformed here (positions by the instance
    matrix, normals by its inverse-transpose), keeping all downstream math
    identical to the flattened path.  ``row``: optional pre-fetched
    :func:`fetch_tri_row` result shared with the other per-hit lookups.
    """
    if row is None:
        row = fetch_tri_row(scene, prim)
    p0, p1, p2 = row["p0"], row["p1"], row["p2"]
    n0, n1, n2 = row["n0"], row["n1"], row["n2"]
    uv0, uv1, uv2 = row["uv0"], row["uv1"], row["uv2"]
    inst_cols = None
    if scene.mode == "tlas":
        ii = jnp.maximum(inst, 0)
        inst_cols = fetch_inst_cols(scene.inst, ii)
        p0 = _inst_xform_point(inst_cols, p0)
        p1 = _inst_xform_point(inst_cols, p1)
        p2 = _inst_xform_point(inst_cols, p2)
        n0 = safe_normalize(_inst_xform_normal(inst_cols, n0))
        n1 = safe_normalize(_inst_xform_normal(inst_cols, n1))
        n2 = safe_normalize(_inst_xform_normal(inst_cols, n2))

    w = (1.0 - u - v)[:, None]
    # position from barycentrics (differentiable w.r.t. vertices), matching
    # the reference's ro + t*I only up to fp error but keeping the gradient
    # path through geometry
    P = w * p0 + u[:, None] * p1 + v[:, None] * p2
    N = safe_normalize(w * n0 + u[:, None] * n1 + v[:, None] * n2)
    uv = w * uv0 + u[:, None] * uv1 + v[:, None] * uv2

    fwd = cross(p1 - p0, p2 - p0)
    fwd_len = jnp.sqrt(jnp.maximum(dot(fwd, fwd, False), 1e-30))
    plane_N = fwd / fwd_len[:, None]
    tri_area = 0.5 * fwd_len

    # texture-space parallelogram area over world parallelogram area: the
    # geometry half of the ray-cone LOD λ (reference ShadeRef.cpp:1279-1283)
    e1, e2 = uv1 - uv0, uv2 - uv0
    ta = jnp.abs(e1[:, 0] * e2[:, 1] - e2[:, 0] * e1[:, 1])
    lod_base = 0.5 * jnp.log2(
        jnp.maximum(ta, 1e-30) / jnp.maximum(fwd_len, 1e-30)
    )

    flip = backface[:, None]
    N = jnp.where(flip, -N, N)
    plane_N = jnp.where(flip, -plane_N, plane_N)

    # radial tangent like the reference (ShadeRef.cpp:1355-1366): rotate the
    # OBJECT-SPACE hit position around Y, then transform the direction back
    # to world (instances may rotate — a world-space radial tangent would
    # mis-orient anisotropy on them).  Flatten mode bakes the affine map
    # Q·P + q0 per triangle; TLAS mode applies the instance inverse live.
    # Degenerate case falls back to the position direction.
    if scene.mode == "tlas":
        iv = inst_cols
        plsx = iv["inv00"] * P[:, 0] + iv["inv01"] * P[:, 1] \
            + iv["inv02"] * P[:, 2] + iv["invtx"]
        plsz = iv["inv20"] * P[:, 0] + iv["inv21"] * P[:, 1] \
            + iv["inv22"] * P[:, 2] + iv["invtz"]
        t_ls = jnp.stack([-plsz, jnp.zeros_like(plsx), plsx], axis=-1)
        tangent = _inst_xform_normal(inst_cols, t_ls)
    else:
        tq = fetch_tri_pieces(scene.tri_surf, prim, ("tanq", "tanq0"))
        Q = tq["tanq"].reshape(-1, 3, 3)
        tangent = jnp.einsum("rij,rj->ri", Q, P,
                             precision=jax.lax.Precision.HIGHEST) \
            + tq["tanq0"]
    degenerate = dot(cross(tangent, N), cross(tangent, N), False) < 1e-20
    tangent = jnp.where(degenerate[:, None], P, tangent)
    B = safe_normalize(cross(tangent, N))
    T = cross(N, B)

    # anisotropic footprint: project the view direction into the surface
    # plane (the ellipse's major axis), map world→UV through the triangle
    # edges (2x2 normal equations), elongation 1/|cosθ| - 1
    cosv = jnp.abs(dot(rd, plane_N, False))
    t_w = rd - dot(rd, plane_N) * plane_N
    t_w = t_w / jnp.sqrt(jnp.maximum(dot(t_w, t_w, False), 1e-20))[:, None]
    we1, we2 = p1 - p0, p2 - p0
    g11 = dot(we1, we1, False)
    g12 = dot(we1, we2, False)
    g22 = dot(we2, we2, False)
    b1 = dot(we1, t_w, False)
    b2 = dot(we2, t_w, False)
    det = jnp.maximum(g11 * g22 - g12 * g12, 1e-20)
    ca = (g22 * b1 - g12 * b2) / det
    cb = (g11 * b2 - g12 * b1) / det
    duv_major_unit = ca[:, None] * e1 + cb[:, None] * e2
    aniso_elong = 1.0 / jnp.maximum(cosv, 0.05) - 1.0

    return Surface(P=P, N=N, plane_N=plane_N, T=T, B=B, uv=uv,
                   backfacing=backface, tri_area=tri_area, lod_base=lod_base,
                   duv_major_unit=jax.lax.stop_gradient(duv_major_unit),
                   aniso_elong=jax.lax.stop_gradient(aniso_elong),
                   raw_tangent=tangent)


def apply_tangent_rotation(scene, mat_id, surf: Surface):
    """Per-material tangent rotation about the (possibly normal-mapped)
    shading normal, then frame rebuild — ShadeRef.cpp:1362-1366 with
    tangent_rotation = 2π·anisotropic_rotation (SceneCPU.cpp:226,263).
    Static no-op when no material rotates."""
    if not scene.has_aniso_rotation:
        return surf
    rot = read_packed([scene.materials["anisotropic_rotation"]],
                      jnp.maximum(mat_id, 0))[0]
    angle = 2.0 * jnp.pi * jnp.clip(rot, 0.0, 1.0)
    n = surf.N
    t = surf.raw_tangent
    c = jnp.cos(angle)[:, None]
    s = jnp.sin(angle)[:, None]
    ndt = dot(n, t)
    t_rot = t * c + cross(n, t) * s + n * ndt * (1.0 - c)
    tangent = jnp.where((angle != 0.0)[:, None], t_rot, t)
    B = safe_normalize(cross(tangent, n))
    T = cross(n, B)
    return surf._replace(T=T, B=B)


def pick_hit_material(scene, prim, backface, row=None):
    """Front/back material id per hit (reference tri_mat_data_t select,
    ShadeRef.cpp:1256-1266). Returns -1 where no material applies."""
    if row is None:
        row = fetch_tri_row(scene, prim)
    front = row["mat_f"].astype(jnp.int32)
    back = row["mat_b"].astype(jnp.int32)
    return jnp.where(backface, back, front)


def resolve_mix(scene, mat_id, uv, mix_rand, I, N, ext_ior, backfacing, tex_rand,
                lam=None, fetch_kw=None, use_fresnel=True):
    """Stochastically resolve Mix-node chains (ShadeRef.cpp:1303-1335).

    Returns (leaf_mat_id, rescaled mix_rand, mix_weight).  Unrolled to
    ``MAX_MIX_DEPTH``; non-Mix lanes pass through unchanged.

    ``use_fresnel=False`` reproduces the *trace-stage* resolve
    (CoreRef.cpp:3103-3126), which — unlike the shade stage — does not
    modulate ``mix_val`` by the dielectric Fresnel term.
    """
    if not scene.has_mix:  # static: no Mix nodes in this scene
        return mat_id, mix_rand, jnp.ones_like(mix_rand)
    mats = scene.materials
    mix_weight = jnp.ones_like(mix_rand)
    for _ in range(MAX_MIX_DEPTH):
        safe_id = jnp.maximum(mat_id, 0)
        (mtype_, mix_val, base_tex, ior, flags_, mm1, mm2) = read_packed(
            [mats["type"], mats["strength"], mats["base_texture"],
             mats["ior"], mats["flags"], mats["mix_mat1"],
             mats["mix_mat2"]],
            safe_id,
        )
        is_mix = (mtype_ == ShadingNode.MIX) & (mat_id >= 0)
        if scene.has_textures:
            lod = (None if lam is None
                   else texture_lod(scene.textures, base_tex, lam))
            tex = sample_bilinear(scene.textures, base_tex, uv, lod,
                                  **(fetch_kw or {}))
            mix_val = mix_val * jnp.where(base_tex >= 0, tex[:, 0], 1.0)
        if use_fresnel:
            eta = jnp.where(
                backfacing,
                safe_div_pos(ext_ior, ior),
                safe_div_pos(ior, ext_ior),
            )
            rr = jnp.where(
                ior != 0.0,
                fresnel_dielectric_cos(dot(I, N, False), eta),
                1.0,
            )
            mix_val = mix_val * jnp.clip(rr, 0.0, 1.0)

        mix_add = (flags_ & MAT_FLAG_MIX_ADD) != 0
        take2 = mix_rand <= mix_val
        new_id = jnp.where(take2, mm2, mm1)
        w_mult = jnp.where(
            mix_add,
            jnp.where(take2, safe_div_pos(1.0, mix_val), safe_div_pos(1.0, 1.0 - mix_val)),
            1.0,
        )
        new_rand = jnp.where(
            take2,
            safe_div_pos(mix_rand, mix_val),
            safe_div_pos(mix_rand - mix_val, 1.0 - mix_val),
        )
        mat_id = jnp.where(is_mix, new_id, mat_id)
        mix_rand = jnp.where(is_mix, jnp.clip(new_rand, 0.0, 1.0), mix_rand)
        mix_weight = jnp.where(is_mix, mix_weight * w_mult, mix_weight)
    return mat_id, mix_rand, mix_weight


def shadow_transmittance(scene, mat_id, uv, lam=None, depth: int = MAX_MIX_DEPTH):
    """Deterministic Mix-weighted transparency color for shadow rays
    (reference CoreRef.cpp:3213-3250: the shadow loop expands the Mix DAG
    with weights — no Fresnel, no stochastic pick — and sums the
    Transparent leaves' base colors)."""
    mats = scene.materials
    safe_id = jnp.maximum(mat_id, 0)
    (mtype, bcol, mix_val, base_tex, mm1, mm2) = read_packed(
        [mats["type"], mats["base_color"], mats["strength"],
         mats["base_texture"], mats["mix_mat1"], mats["mix_mat2"]],
        safe_id,
    )
    is_transp = (mtype == ShadingNode.TRANSPARENT) & (mat_id >= 0)
    leaf = jnp.where(is_transp[:, None], bcol, 0.0)
    if depth == 0:
        return leaf
    is_mix = (mtype == ShadingNode.MIX) & (mat_id >= 0)
    if not scene.has_mix:  # static: Transparent leaves only
        return leaf
    if scene.has_textures:
        from ray_tpu.scene.textures import sample_bilinear, texture_lod

        lod = None if lam is None else texture_lod(scene.textures, base_tex, lam)
        tex = sample_bilinear(scene.textures, base_tex, uv, lod)
        mix_val = mix_val * jnp.where(base_tex >= 0, tex[:, 0], 1.0)
    mix_val = jnp.clip(mix_val, 0.0, 1.0)
    t1 = shadow_transmittance(scene, mm1, uv, lam, depth - 1)
    t2 = shadow_transmittance(scene, mm2, uv, lam, depth - 1)
    mixed = (1.0 - mix_val)[:, None] * t1 + mix_val[:, None] * t2
    return jnp.where(is_mix[:, None], mixed, leaf)


def apply_normal_map(scene, mat_id, surf: Surface, I, tex_rand, lam=None,
                     fetch_kw=None):
    """Tangent-space normal mapping + Cycles' ensure_valid_reflection-lite
    clamp (full iterative version: ShadeRef.cpp:252-352; we clamp the shading
    normal so the reflection of -I stays above the geometric horizon)."""
    if not scene.has_normal_maps:  # static
        return surf
    mats = scene.materials
    safe_id = jnp.maximum(mat_id, 0)
    nm, nm_k = read_packed(
        [mats["normal_map"], mats["normal_map_intensity"]], safe_id
    )
    has = nm >= 0
    lod = None if lam is None else texture_lod(scene.textures, nm, lam)
    tex = sample_bilinear(scene.textures, nm, surf.uv, lod,
                          **(fetch_kw or {}))
    n_ts = tex[:, :3] * 2.0 - 1.0
    n_ts = n_ts.at[:, 2].set(
        jnp.sqrt(jnp.maximum(1.0 - n_ts[:, 0] ** 2 - n_ts[:, 1] ** 2, 0.0))
    )
    N_new = safe_normalize(
        n_ts[:, 0:1] * surf.T + n_ts[:, 2:3] * surf.N + n_ts[:, 1:2] * surf.B
    )
    k = nm_k[:, None]
    N_new = safe_normalize(surf.N + (N_new - surf.N) * k)

    # keep reflections valid: blend back toward geometric normal if the
    # reflected view direction would dip below the surface
    R = I - 2.0 * dot(surf.plane_N, I) * surf.plane_N  # unused directly; guard below
    refl = I - 2.0 * dot(N_new, I) * N_new
    bad = dot(surf.plane_N, refl, False) < 0.01 * jnp.abs(dot(surf.plane_N, I, False))
    N_fixed = jnp.where(bad[:, None], surf.plane_N, N_new)

    N_out = jnp.where(has[:, None], N_fixed, surf.N)
    B = safe_normalize(cross(surf.T, N_out))
    T = cross(N_out, B)
    return surf._replace(N=N_out, B=B, T=T)
