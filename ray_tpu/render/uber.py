"""The uber-BSDF: one superset parameter block evaluated for every hit.

The reference dispatches per material type to Diffuse/Glossy/Refractive/
Emissive/Principled node functions (internal/ShadeRef.cpp:1471-1649).  On a
vector machine we fold all node types into the Principled superset once per
hit: a node type simply pins the lobe weights/parameters
(Diffuse → diffuse-only with Oren-Nayar, Glossy → specular-only with
specular=0.5, Refractive → refraction-only with fresnel=0, Principled → the
Cycles-style lobe weighting of ShadeRef.cpp:32-52), and evaluation is pure
arithmetic + selects.  This removes all shading divergence and lets XLA fuse
the entire shade stage.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from ray_tpu.ops.gather import read_packed
from ray_tpu.ops.linalg import dot, lum, safe_div_pos, saturate
from ray_tpu.render.bsdf.microfacet import (
    PI,
    calc_alpha,
    fresnel_dielectric_cos,
)
from ray_tpu.render.bsdf import lobes
from ray_tpu.scene.materials import ShadingNode
from ray_tpu.scene.textures import sample_bilinear, texture_lod

# ray types (reference internal/Constants.inl:58-63)
RAY_TYPE_CAMERA = 0
RAY_TYPE_DIFFUSE = 1
RAY_TYPE_SPECULAR = 2
RAY_TYPE_REFR = 3
RAY_TYPE_SHADOW = 4


@dataclasses.dataclass(frozen=True)
class MatFeatures:
    """Static per-scene shading features, derived from the set of node
    *types* present (``SceneFlat.mat_types``).  Node types are discrete
    non-differentiable data, so tracing lobe blocks away when no material
    can reach them is semantics- and gradient-preserving — the XLA
    counterpart of the reference compiling per-feature shader variants
    (scripts/compile_shaders.py:155+)."""

    principled: bool = True
    diffuse: bool = True      # a plain DIFFUSE node exists
    glossy: bool = True
    refractive: bool = True
    transparent: bool = True

    @property
    def any_diffuse(self) -> bool:
        return self.principled or self.diffuse

    @property
    def any_spec(self) -> bool:
        return self.principled or self.glossy

    @property
    def any_refr(self) -> bool:
        return self.principled or self.refractive

    @property
    def coat(self) -> bool:
        return self.principled


_ALL_FEATURES = MatFeatures()


def mat_features(mat_types) -> MatFeatures:
    """Features for a static node-type tuple (None → everything on)."""
    if mat_types is None:
        return _ALL_FEATURES
    s = frozenset(int(t) for t in mat_types)
    return MatFeatures(
        principled=ShadingNode.PRINCIPLED in s,
        diffuse=ShadingNode.DIFFUSE in s,
        glossy=ShadingNode.GLOSSY in s,
        refractive=ShadingNode.REFRACTIVE in s,
        transparent=ShadingNode.TRANSPARENT in s,
    )


class UberParams(NamedTuple):
    """Resolved, texture-applied shading parameters for a wavefront of hits."""

    # lobe pick weights (normalized)
    w_diffuse: jnp.ndarray
    w_specular: jnp.ndarray
    w_clearcoat: jnp.ndarray
    w_refraction: jnp.ndarray
    # diffuse
    use_principled_diffuse: jnp.ndarray  # bool: Burley vs Oren-Nayar
    base_color: jnp.ndarray              # (R,3)
    sheen_color: jnp.ndarray             # (R,3)
    roughness: jnp.ndarray
    metallic: jnp.ndarray
    transmission: jnp.ndarray
    # specular
    spec_col: jnp.ndarray                # (R,3)
    spec_col_90: jnp.ndarray             # (R,3)
    spec_alpha: jnp.ndarray              # (R,2)
    spec_ior: jnp.ndarray
    spec_F0: jnp.ndarray
    # clearcoat
    coat_roughness2: jnp.ndarray
    coat_ior: jnp.ndarray
    coat_F0: jnp.ndarray
    # transmission
    refr_spec_alpha: jnp.ndarray         # (R,2) reflection component alpha
    trans_alpha: jnp.ndarray             # (R,2)
    trans_eta: jnp.ndarray
    trans_fresnel: jnp.ndarray
    int_ior: jnp.ndarray
    # emission / passthrough
    emission: jnp.ndarray                # (R,3)
    is_emissive: jnp.ndarray             # bool
    is_transparent: jnp.ndarray          # bool
    imp_sample: jnp.ndarray              # bool: emissive geo is NEE-sampled


def _spec_ior_from_specular(specular):
    # 1e-12 floor keeps d(ior)/d(specular) finite at specular == 0
    return (2.0 / (1.0 - jnp.sqrt(jnp.maximum(0.08 * specular, 1e-12)))) - 1.0


def gather_uber_params(scene, mat_id, uv, I, N, backfacing, ext_ior, tex_rand,
                       regularize_alpha=0.0, lam=None, min_roughness=0.0,
                       feats: MatFeatures = None, fetch_kw=None):
    """Gather material columns for each hit and resolve node-type semantics
    into the uber parameter block (reference ShadeRef.cpp:1419-1649).

    ``lam``: optional (R,) ray-cone LOD λ; each texture fetch derives its
    own mip level from it (reference get_texture_lod per fetch).
    ``feats``: static :class:`MatFeatures` — lobe families no node type in
    the scene can reach are traced away entirely."""
    if feats is None:
        feats = mat_features(getattr(scene, "mat_types", None))
    m = scene.materials
    i = jnp.maximum(mat_id, 0)
    R = uv.shape[0]
    zero = jnp.zeros((R,), jnp.float32)
    one = jnp.ones((R,), jnp.float32)
    zero2 = jnp.zeros((R, 2), jnp.float32)
    zero3 = jnp.zeros((R, 3), jnp.float32)

    # one packed one-hot-matmul read replaces ~20 per-column gathers —
    # gather fusions were ~45% of forward device time (ops/gather.py);
    # the column list shrinks with the scene's static feature set
    cols = ["type", "base_color", "base_texture", "roughness",
            "roughness_texture", "strength", "emission_strength",
            "emission_color", "flags"]
    if feats.principled:
        cols += ["metallic", "metallic_texture", "specular",
                 "specular_texture", "specular_tint", "transmission",
                 "transmission_roughness", "clearcoat",
                 "clearcoat_roughness", "sheen", "sheen_tint"]
    if feats.any_spec:
        cols += ["anisotropic"]
    if feats.any_refr:
        cols += ["ior"]
    vals = dict(zip(cols, read_packed([m[c] for c in cols], i)))

    mtype = vals["type"]
    base_color = vals["base_color"]
    base_tex = vals["base_texture"]
    roughness = vals["roughness"]
    rough_tex = vals["roughness_texture"]
    strength = vals["strength"]
    emis_strength = vals["emission_strength"]
    emission_color = vals["emission_color"]
    flags = vals["flags"]
    metallic = vals.get("metallic", zero)
    specular = vals.get("specular", zero)
    specular_tint = vals.get("specular_tint", zero)
    transmission = vals.get("transmission", zero)
    transmission_roughness = vals.get("transmission_roughness", zero)
    clearcoat = vals.get("clearcoat", zero)
    clearcoat_roughness = vals.get("clearcoat_roughness", zero)
    sheen = 2.0 * vals.get("sheen", zero)
    sheen_tint = vals.get("sheen_tint", zero)
    anisotropic = vals.get("anisotropic", zero)
    mat_ior = vals.get("ior", one)

    def _fetch(tex_id):
        if not scene.has_textures:  # static: trace away the whole fetch
            return jnp.ones((uv.shape[0], 4), jnp.float32)
        lod = None if lam is None else texture_lod(scene.textures, tex_id, lam)
        return sample_bilinear(scene.textures, tex_id, uv, lod,
                               **(fetch_kw or {}))

    tex = _fetch(base_tex)
    base_color = base_color * jnp.where((base_tex >= 0)[:, None], tex[:, :3], 1.0)

    rtex = _fetch(rough_tex)
    roughness = roughness * jnp.where(rough_tex >= 0, rtex[:, 0], 1.0)
    if min_roughness > 0.0:  # spatial-cache update pass (ShadeRef.cpp:1450)
        roughness = jnp.maximum(roughness, min_roughness)

    if feats.principled:
        met_tex = vals["metallic_texture"]
        mtex = _fetch(met_tex)
        metallic = metallic * jnp.where(met_tex >= 0, mtex[:, 0], 1.0)
        spec_tex = vals["specular_texture"]
        stex = _fetch(spec_tex)
        specular = specular * jnp.where(spec_tex >= 0, stex[:, 0], 1.0)

    base_color_lum = lum(base_color)

    is_principled = mtype == ShadingNode.PRINCIPLED
    is_diffuse_node = mtype == ShadingNode.DIFFUSE
    is_glossy = mtype == ShadingNode.GLOSSY
    is_refractive = mtype == ShadingNode.REFRACTIVE
    is_emissive = mtype == ShadingNode.EMISSIVE
    is_transparent = mtype == ShadingNode.TRANSPARENT

    if feats.principled:
        tint_color = jnp.where(
            (base_color_lum > 0.0)[:, None],
            base_color / jnp.maximum(base_color_lum, 1e-12)[:, None],
            0.0,
        )
        # ---- principled parameter derivation (ShadeRef.cpp:1556-1640) ----
        sheen_color = sheen[:, None] * (
            (1.0 - sheen_tint)[:, None] + sheen_tint[:, None] * tint_color
        )
        p_spec_col = (
            (1.0 - specular_tint)[:, None]
            + specular_tint[:, None] * tint_color
        )
        p_spec_col = (
            (1.0 - metallic)[:, None] * (specular[:, None] * 0.08 * p_spec_col)
            + metallic[:, None] * base_color
        )
        p_spec_ior = _spec_ior_from_specular(specular)
        p_spec_F0 = fresnel_dielectric_cos(
            jnp.ones_like(p_spec_ior), p_spec_ior
        )

        coat_ior = _spec_ior_from_specular(clearcoat)
        coat_F0 = fresnel_dielectric_cos(jnp.ones_like(coat_ior), coat_ior)
        coat_roughness2 = calc_alpha(
            clearcoat_roughness, zero, regularize_alpha
        )[:, 0]

        # approx spec color lum w/ Fresnel toward white (ShadeRef.cpp:1629)
        FN = (
            fresnel_dielectric_cos(dot(I, N, False), p_spec_ior) - p_spec_F0
        ) / jnp.maximum(1.0 - p_spec_F0, 1e-6)
        approx_spec_col = p_spec_col + FN[:, None] * (1.0 - p_spec_col)
        spec_color_lum = lum(approx_spec_col)

        # Cycles-style lobe weights (ShadeRef.cpp:32-52)
        bcl = base_color_lum + sheen * (1.0 - base_color_lum)
        w_d = bcl * (1.0 - metallic) * (1.0 - transmission)
        final_trans = transmission * (1.0 - metallic)
        w_s = jnp.where(
            (specular != 0.0) | (metallic != 0.0),
            spec_color_lum * (1.0 - final_trans), 0.0,
        )
        w_c = 0.25 * clearcoat * (1.0 - metallic)
        w_r = final_trans * bcl
        total = w_d + w_s + w_c + w_r
        inv_total = jnp.where(total > 0.0, 1.0 / jnp.maximum(total, 1e-12), 0.0)
        w_d, w_s, w_c, w_r = (w * inv_total for w in (w_d, w_s, w_c, w_r))
    else:
        sheen_color = zero3
        coat_ior = one
        coat_F0 = zero
        coat_roughness2 = zero

    # ---- node-type overrides ----
    w_diffuse = jnp.where(is_diffuse_node, one, zero)
    w_specular = jnp.where(is_glossy, one, zero) if feats.glossy else zero
    w_clearcoat = zero
    w_refraction = (
        jnp.where(is_refractive, one, zero) if feats.refractive else zero
    )
    if feats.principled:
        w_diffuse = jnp.where(is_principled, w_d, w_diffuse)
        w_specular = jnp.where(is_principled, w_s, w_specular)
        w_clearcoat = jnp.where(is_principled, w_c, w_clearcoat)
        w_refraction = jnp.where(is_principled, w_r, w_refraction)

    if feats.any_spec:
        g_spec_ior = jnp.full_like(roughness, _spec_ior_from_specular(0.5))
        g_spec_F0 = fresnel_dielectric_cos(jnp.ones_like(g_spec_ior), g_spec_ior)
        if feats.principled:
            spec_ior = jnp.where(is_principled, p_spec_ior, g_spec_ior)
            spec_F0 = jnp.where(is_principled, p_spec_F0, g_spec_F0)
            spec_col = jnp.where(is_principled[:, None], p_spec_col, base_color)
            spec_col_90 = jnp.where(
                is_principled[:, None], jnp.ones_like(base_color), base_color
            )
        else:
            spec_ior = g_spec_ior
            spec_F0 = g_spec_F0
            spec_col = base_color
            spec_col_90 = base_color
        spec_alpha = calc_alpha(roughness, anisotropic, regularize_alpha)
    else:
        spec_ior = one
        spec_F0 = zero
        spec_col = zero3
        spec_col_90 = zero3
        spec_alpha = zero2

    if feats.any_refr:
        eta = jnp.where(
            backfacing,
            safe_div_pos(mat_ior, ext_ior),
            safe_div_pos(ext_ior, mat_ior),
        )
        refr_spec_alpha = calc_alpha(roughness, zero, regularize_alpha)
        if feats.principled:
            trans_roughness = (
                1.0 - (1.0 - roughness) * (1.0 - transmission_roughness)
            )
            trans_fresnel = fresnel_dielectric_cos(
                dot(I, N, False), safe_div_pos(jnp.ones_like(eta), eta)
            )
            trans_alpha = jnp.where(
                is_principled[:, None],
                calc_alpha(trans_roughness, zero, regularize_alpha),
                refr_spec_alpha,
            )
            # Refractive node always transmits: fresnel pick prob 0
            trans_fresnel = jnp.where(is_principled, trans_fresnel, 0.0)
        else:
            trans_alpha = refr_spec_alpha
            trans_fresnel = zero
    else:
        eta = one
        refr_spec_alpha = zero2
        trans_alpha = zero2
        trans_fresnel = zero

    emission = jnp.where(
        is_emissive[:, None],
        base_color * strength[:, None],
        emission_color * emis_strength[:, None],
    )
    from ray_tpu.scene.materials import MAT_FLAG_IMP_SAMPLE

    imp = (flags & MAT_FLAG_IMP_SAMPLE) != 0

    return UberParams(
        w_diffuse=w_diffuse,
        w_specular=w_specular,
        w_clearcoat=w_clearcoat,
        w_refraction=w_refraction,
        use_principled_diffuse=is_principled,
        base_color=base_color,
        sheen_color=(
            jnp.where(is_principled[:, None], sheen_color, 0.0)
            if feats.principled else sheen_color
        ),
        roughness=roughness,
        metallic=(
            jnp.where(is_principled, metallic, 0.0)
            if feats.principled else metallic
        ),
        transmission=(
            jnp.where(is_principled, transmission, 0.0)
            if feats.principled else transmission
        ),
        spec_col=spec_col,
        spec_col_90=spec_col_90,
        spec_alpha=spec_alpha,
        spec_ior=spec_ior,
        spec_F0=spec_F0,
        coat_roughness2=coat_roughness2,
        coat_ior=coat_ior,
        coat_F0=coat_F0,
        refr_spec_alpha=refr_spec_alpha,
        trans_alpha=trans_alpha,
        trans_eta=eta,
        trans_fresnel=trans_fresnel,
        int_ior=mat_ior,
        emission=emission,
        is_emissive=is_emissive,
        is_transparent=is_transparent,
        imp_sample=imp,
    )


def eval_uber(p: UberParams, T, B, N, I, L, feats: MatFeatures = _ALL_FEATURES):
    """Mixture f_cos + pdf for NEE (reference Evaluate_PrincipledNode,
    ShadeRef.cpp:811-903, generalized to all node types).  Lobe families
    outside the static ``feats`` set are traced away."""
    n_dot_l = dot(N, L, False)
    f_total = jnp.zeros_like(p.base_color)
    pdf_total = jnp.zeros_like(n_dot_l)

    # diffuse
    if feats.any_diffuse:
        if feats.principled and feats.diffuse:
            f_or, pdf_or = lobes.eval_oren_diffuse(
                -I, N, L, p.roughness, p.base_color
            )
            f_pr, pdf_pr = lobes.eval_principled_diffuse(
                -I, N, L, p.roughness, p.base_color, p.sheen_color
            )
            f_dif = jnp.where(p.use_principled_diffuse[:, None], f_pr, f_or)
            pdf_dif = jnp.where(p.use_principled_diffuse, pdf_pr, pdf_or)
        elif feats.principled:
            f_dif, pdf_dif = lobes.eval_principled_diffuse(
                -I, N, L, p.roughness, p.base_color, p.sheen_color
            )
        else:
            f_dif, pdf_dif = lobes.eval_oren_diffuse(
                -I, N, L, p.roughness, p.base_color
            )
        if feats.principled:
            f_dif = f_dif * (
                (1.0 - p.metallic) * (1.0 - p.transmission)
            )[:, None]
        on = (p.w_diffuse > 0.0) & (n_dot_l > 0.0)
        f_total += jnp.where(on[:, None], f_dif, 0.0)
        pdf_total += jnp.where(on, p.w_diffuse * pdf_dif, 0.0)

    # main specular
    if feats.any_spec:
        f_sp, pdf_sp = lobes.eval_ggx_specular(
            T, B, N, I, L, p.spec_alpha, p.spec_ior, p.spec_F0, p.spec_col,
            p.spec_col_90,
        )
        on = (p.w_specular > 0.0) & (n_dot_l > 0.0)
        f_total += jnp.where(on[:, None], f_sp, 0.0)
        pdf_total += jnp.where(on, p.w_specular * pdf_sp, 0.0)

    # clearcoat
    if feats.coat:
        f_cc, pdf_cc = lobes.eval_clearcoat(
            T, B, N, I, L, p.coat_roughness2, p.coat_ior, p.coat_F0
        )
        on = (p.w_clearcoat > 0.0) & (n_dot_l > 0.0)
        f_total += jnp.where(on[:, None], 0.25 * f_cc[:, None], 0.0)
        pdf_total += jnp.where(on, p.w_clearcoat * pdf_cc, 0.0)

    if feats.any_refr:
        # refraction: reflective component
        white = jnp.ones_like(p.base_color)
        f_rr, pdf_rr = lobes.eval_ggx_specular(
            T, B, N, I, L, p.refr_spec_alpha,
            jnp.ones_like(p.spec_ior), jnp.zeros_like(p.spec_F0), white, white,
        )
        on = (p.w_refraction > 0.0) & (p.trans_fresnel != 0.0) & (n_dot_l > 0.0)
        f_total += jnp.where(on[:, None], f_rr * p.trans_fresnel[:, None], 0.0)
        pdf_total += jnp.where(
            on, p.w_refraction * p.trans_fresnel * pdf_rr, 0.0
        )

        # refraction: transmissive component
        f_rt, pdf_rt = lobes.eval_ggx_refraction(
            T, B, N, I, L, p.trans_alpha, p.trans_eta, p.base_color
        )
        on = (p.w_refraction > 0.0) & (p.trans_fresnel != 1.0) & (n_dot_l < 0.0)
        f_total += jnp.where(
            on[:, None], f_rt * (1.0 - p.trans_fresnel)[:, None], 0.0
        )
        pdf_total += jnp.where(
            on, p.w_refraction * (1.0 - p.trans_fresnel) * pdf_rt, 0.0
        )

    return f_total, pdf_total


class BsdfSample(NamedTuple):
    dir: jnp.ndarray          # (R, 3)
    weight: jnp.ndarray       # (R, 3) throughput multiplier f_cos/(pdf·P)
    pdf: jnp.ndarray          # (R,) pdf for next-hit MIS
    ray_type: jnp.ndarray     # (R,) i32
    flip_origin: jnp.ndarray  # (R,) bool — offset origin along -plane_N
    cone_spread_inc: jnp.ndarray  # (R,) ray-cone spread growth (Constants.inl:108)


def sample_uber(p: UberParams, T, B, N, I, rand2, mix_rand,
                feats: MatFeatures = _ALL_FEATURES):
    """Pick one lobe by ``mix_rand`` against the normalized lobe weights and
    sample it (reference Sample_PrincipledNode, ShadeRef.cpp:905-1035).
    Lobe families outside the static ``feats`` set are traced away."""
    R = mix_rand.shape[0]
    zero = jnp.zeros((R,), jnp.float32)
    zero3 = jnp.zeros((R, 3), jnp.float32)
    false = jnp.zeros((R,), jnp.bool_)

    cdf_d = p.w_diffuse
    cdf_s = cdf_d + p.w_specular
    cdf_c = cdf_s + p.w_clearcoat

    pick_d = (mix_rand < cdf_d) if feats.any_diffuse else false
    pick_s = ((~pick_d) & (mix_rand < cdf_s)) if feats.any_spec else false
    pick_c = (
        ((~pick_d) & (~pick_s) & (mix_rand < cdf_c)) if feats.coat else false
    )
    pick_r = (
        ((~pick_d) & (~pick_s) & (~pick_c) & (p.w_refraction > 0.0))
        if feats.any_refr else false
    )

    # --- diffuse ---
    if feats.any_diffuse:
        if feats.principled and feats.diffuse:
            dir_u = lobes.sample_uniform_hemisphere(T, B, N, rand2)
            dir_c = lobes.sample_cosine_hemisphere(T, B, N, rand2)
            dir_dif = jnp.where(p.use_principled_diffuse[:, None], dir_c, dir_u)
        elif feats.principled:
            dir_dif = lobes.sample_cosine_hemisphere(T, B, N, rand2)
        else:
            dir_dif = lobes.sample_uniform_hemisphere(T, B, N, rand2)
        if feats.principled and feats.diffuse:
            f_or, pdf_or = lobes.eval_oren_diffuse(
                -I, N, dir_dif, p.roughness, p.base_color
            )
            f_pr, pdf_pr = lobes.eval_principled_diffuse(
                -I, N, dir_dif, p.roughness, p.base_color, p.sheen_color
            )
            f_dif = jnp.where(p.use_principled_diffuse[:, None], f_pr, f_or)
            pdf_dif = jnp.where(p.use_principled_diffuse, pdf_pr, pdf_or)
        elif feats.principled:
            f_dif, pdf_dif = lobes.eval_principled_diffuse(
                -I, N, dir_dif, p.roughness, p.base_color, p.sheen_color
            )
        else:
            f_dif, pdf_dif = lobes.eval_oren_diffuse(
                -I, N, dir_dif, p.roughness, p.base_color
            )
        if feats.principled:
            f_dif = f_dif * (
                (1.0 - p.metallic) * (1.0 - p.transmission)
            )[:, None]
        w_dif = f_dif * safe_div_pos(
            1.0, pdf_dif * jnp.maximum(p.w_diffuse, 1e-9)
        )[:, None]
        pdf_dif_out = pdf_dif * p.w_diffuse
    else:
        dir_dif, w_dif, pdf_dif_out = zero3, zero3, zero

    # --- specular ---
    if feats.any_spec:
        dir_sp, f_sp, pdf_sp = lobes.sample_ggx_specular(
            T, B, N, I, p.spec_alpha, p.spec_ior, p.spec_F0, p.spec_col,
            p.spec_col_90, rand2,
        )
        w_sp = f_sp * safe_div_pos(
            1.0, pdf_sp * jnp.maximum(p.w_specular, 1e-9)
        )[:, None]
        pdf_sp_out = pdf_sp * p.w_specular
    else:
        dir_sp, w_sp, pdf_sp_out = zero3, zero3, zero

    # --- clearcoat ---
    if feats.coat:
        dir_cc, f_cc, pdf_cc = lobes.sample_clearcoat(
            T, B, N, I, p.coat_roughness2, p.coat_ior, p.coat_F0, rand2
        )
        w_cc = (
            0.25 * f_cc
            * safe_div_pos(1.0, pdf_cc * jnp.maximum(p.w_clearcoat, 1e-9))
        )[:, None] * jnp.ones_like(p.base_color)
        pdf_cc_out = pdf_cc * p.w_clearcoat
    else:
        dir_cc, w_cc, pdf_cc_out = zero3, zero3, zero

    # --- refraction branch: inner split reflect vs refract by fresnel ---
    if feats.any_refr:
        r_inner = saturate(
            safe_div_pos(mix_rand - cdf_c, jnp.maximum(p.w_refraction, 1e-9))
        )
        pick_rr = pick_r & (r_inner < p.trans_fresnel)   # reflect
        white = jnp.ones_like(p.base_color)
        dir_rr, f_rr, pdf_rr = lobes.sample_ggx_specular(
            T, B, N, I, p.refr_spec_alpha,
            jnp.ones_like(p.spec_ior), jnp.zeros_like(p.spec_F0), white,
            white, rand2,
        )
        dir_rt, f_rt, pdf_rt = lobes.sample_ggx_refraction(
            T, B, N, I, p.trans_alpha, p.trans_eta, p.base_color, rand2
        )
        dir_refr = jnp.where(pick_rr[:, None], dir_rr, dir_rt)
        f_refr = jnp.where(pick_rr[:, None], f_rr, f_rt)
        pdf_refr = jnp.where(pick_rr, pdf_rr, pdf_rt)
        w_refr = f_refr * safe_div_pos(
            1.0, pdf_refr * jnp.maximum(p.w_refraction, 1e-9)
        )[:, None]
        pdf_refr_out = pdf_refr * p.w_refraction
    else:
        pick_rr = false
        dir_refr, w_refr, pdf_refr_out = zero3, zero3, zero

    # --- select ---
    def sel(va, vb, vc, vd):
        return jnp.where(
            pick_d[..., None] if va.ndim == 2 else pick_d, va,
            jnp.where(
                pick_s[..., None] if va.ndim == 2 else pick_s, vb,
                jnp.where(pick_c[..., None] if va.ndim == 2 else pick_c, vc, vd),
            ),
        )

    out_dir = sel(dir_dif, dir_sp, dir_cc, dir_refr)
    out_w = sel(w_dif, w_sp, w_cc, w_refr)
    out_pdf = sel(pdf_dif_out, pdf_sp_out, pdf_cc_out, pdf_refr_out)

    # ray-cone spread growth per lobe: full increment for diffuse, scaled
    # by the lobe's min GGX alpha for glossy lobes (ShadeRef.cpp:686-1009,
    # MAX_CONE_SPREAD_INCREMENT = 0.05, Constants.inl:108)
    MAX_CONE_SPREAD_INCREMENT = 0.05
    inc_refr = jnp.where(
        pick_rr,
        jnp.min(p.refr_spec_alpha, axis=-1),
        jnp.min(p.trans_alpha, axis=-1),
    ) if feats.any_refr else zero
    cone_inc = MAX_CONE_SPREAD_INCREMENT * sel(
        jnp.ones_like(out_pdf),
        jnp.min(p.spec_alpha, axis=-1) if feats.any_spec else zero,
        p.coat_roughness2,
        inc_refr,
    )
    ray_type = jnp.where(
        pick_d, RAY_TYPE_DIFFUSE,
        jnp.where(
            pick_s | pick_c | pick_rr, RAY_TYPE_SPECULAR,
            jnp.where(pick_r, RAY_TYPE_REFR, 0),
        ),
    ).astype(jnp.int32)
    flip_origin = pick_r & (~pick_rr)

    # transparent node: pass straight through, tinted by base_color
    # (reference r.c *= mat->base_color, CoreRef.cpp:3143-3145)
    if feats.transparent:
        out_dir = jnp.where(p.is_transparent[:, None], I, out_dir)
        out_w = jnp.where(p.is_transparent[:, None], p.base_color, out_w)
        out_pdf = jnp.where(p.is_transparent, lobes.DELTA_PDF, out_pdf)
        ray_type = jnp.where(p.is_transparent, 5, ray_type)  # 5 = transparency
        flip_origin = flip_origin | p.is_transparent
        cone_inc = jnp.where(p.is_transparent, 0.0, cone_inc)

    # emissive / no-lobe: dead sample
    dead = p.is_emissive | (
        (~pick_d) & (~pick_s) & (~pick_c) & (~pick_r) & (~p.is_transparent)
    )
    out_w = jnp.where(dead[:, None], 0.0, out_w)
    out_pdf = jnp.where(dead, 0.0, out_pdf)

    return BsdfSample(
        dir=out_dir, weight=out_w, pdf=out_pdf, ray_type=ray_type,
        flip_origin=flip_origin, cone_spread_inc=cone_inc,
    )
