"""BSDF lobe evaluate/sample pairs.

Uniform convention across every lobe (so the integrator composes them with
pure arithmetic):

* ``eval_*``  returns ``(f_cos, pdf)`` — BSDF × |cos| as an RGB weight such
  that an NEE contribution is ``light_col * f_cos / light_pdf``, and the
  solid-angle pdf of the lobe's own sampler for that direction.
* ``sample_*`` returns ``(dir, f_cos, pdf)`` for a direction drawn from the
  lobe; the path throughput update is ``f_cos / (pdf * P_lobe)``.
  Delta lobes (mirror/perfect refraction) return pdf ≈ 1e6 like the
  reference's convention so MIS naturally suppresses light-sampled
  counterparts (reference internal/ShadeRef.cpp:512-519).

Parity: reference internal/ShadeRef.cpp:380-700 (Oren-Nayar, Principled
diffuse + sheen, GGX specular with bounded VNDF, GGX refraction, GTR1
clearcoat), same tangent-space conventions, ray direction ``I`` points into
the surface.
"""

from __future__ import annotations

import jax.numpy as jnp

from ray_tpu.ops.linalg import (
    dot,
    safe_div_pos,
    saturate,
    sqr,
    tangent_from_world,
    world_from_tangent,
)
from ray_tpu.render.bsdf.microfacet import (
    D_GGX,
    D_GTR1,
    G1,
    PI,
    fresnel_dielectric_cos,
    ggx_vndf_reflection_bounded_pdf,
    reflect,
    sample_ggx_vndf,
    sample_ggx_vndf_bounded,
    schlick_weight,
)

DELTA_PDF = 1e6  # pseudo-pdf of specular delta lobes


def _normalize(v):
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-30))


def _sincos(phi):
    return jnp.sin(phi), jnp.cos(phi)


# --------------------------------------------------------------------------
# Diffuse
# --------------------------------------------------------------------------

def eval_oren_diffuse(V, N, L, roughness, base_color):
    """Oren-Nayar with the reference's normalization (ShadeRef.cpp:403);
    sampled uniformly over the hemisphere → pdf 1/(2π)."""
    sigma = roughness
    div = 1.0 / (PI + ((3.0 * PI - 4.0) / 6.0) * sigma)
    a = div
    b = sigma * div
    nl = jnp.maximum(dot(N, L, False), 0.0)
    nv = jnp.maximum(dot(N, V, False), 0.0)
    t = dot(L, V, False) - nl * nv
    t = jnp.where(t > 0.0, t / (jnp.maximum(nl, nv) + 1e-37), t)
    f_cos = (nl * (a + b * t))[..., None] * base_color
    pdf = jnp.full_like(nl, 0.5 / PI)
    return f_cos, pdf


def sample_uniform_hemisphere(T, B, N, rand):
    phi = 2.0 * PI * rand[..., 1]
    sp, cp = _sincos(phi)
    z = rand[..., 0]
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    v_ts = jnp.stack([r * cp, r * sp, z], axis=-1)
    return world_from_tangent(T, B, N, v_ts)


def sample_cosine_hemisphere(T, B, N, rand):
    phi = 2.0 * PI * rand[..., 1]
    sp, cp = _sincos(phi)
    r = jnp.sqrt(rand[..., 0])
    z = jnp.sqrt(jnp.maximum(1.0 - rand[..., 0], 0.0))
    v_ts = jnp.stack([r * cp, r * sp, z], axis=-1)
    return world_from_tangent(T, B, N, v_ts)


def eval_principled_diffuse(V, N, L, roughness, base_color, sheen_color):
    """Burley diffuse retro-reflection + sheen (ShadeRef.cpp:385-421, 442);
    cosine-sampled → pdf N·L/π; f_cos folds the N·L/π factor the reference
    applies at the call site (ShadeRef.cpp:925)."""
    n_dot_l = dot(N, L, False)
    n_dot_v = dot(N, V, False)
    H = _normalize(L + V)
    H = jnp.where(dot(V, H) < 0.0, -H, H)
    l_dot_h = dot(L, H, False)
    FL = schlick_weight(n_dot_l)
    FV = schlick_weight(n_dot_v)
    Fd90 = 0.5 + 2.0 * l_dot_h * l_dot_h * roughness
    Fd = (1.0 + (Fd90 - 1.0) * FL) * (1.0 + (Fd90 - 1.0) * FV)
    Fd = jnp.where(n_dot_l > 0.0, Fd, 0.0)
    FH = PI * schlick_weight(l_dot_h)
    diff_col = base_color * Fd[..., None] + FH[..., None] * sheen_color
    f_cos = jnp.maximum(n_dot_l, 0.0)[..., None] * diff_col / PI
    pdf = jnp.maximum(n_dot_l, 0.0) / PI
    return f_cos, pdf


# --------------------------------------------------------------------------
# GGX specular reflection
# --------------------------------------------------------------------------

def eval_ggx_specular_ts(view_ts, h_ts, refl_ts, alpha, spec_ior, spec_F0, col, col90):
    """All-tangent-space GGX reflection (ShadeRef.cpp:490-512)."""
    D = D_GGX(h_ts, alpha)
    G = G1(view_ts, alpha) * G1(refl_ts, alpha)
    FH = (fresnel_dielectric_cos(dot(view_ts, h_ts, False), spec_ior) - spec_F0) / (
        jnp.maximum(1.0 - spec_F0, 1e-6)
    )
    F = col + FH[..., None] * (col90 - col)
    denom = 4.0 * jnp.abs(view_ts[..., 2] * refl_ts[..., 2])
    scale = jnp.where(denom != 0.0, D * G / jnp.where(denom != 0.0, denom, 1.0), 0.0)
    f_cos = F * (scale * jnp.maximum(refl_ts[..., 2], 0.0))[..., None]
    pdf = ggx_vndf_reflection_bounded_pdf(D, view_ts, alpha)
    return f_cos, pdf


def _benign_alpha(alpha, smooth):
    """Double-where guard: masked-smooth lanes evaluate with a harmless
    alpha so no 1/alpha² intermediates overflow f32 in the backward pass
    (observed: ~1e44 partials through D_GGX at alpha→1e-9)."""
    return jnp.where(smooth[..., None], 0.01, alpha)


def eval_ggx_specular(T, B, N, I, L, alpha, spec_ior, spec_F0, col, col90):
    smooth = alpha[..., 0] * alpha[..., 1] < 1e-7
    alpha = _benign_alpha(alpha, smooth)
    view_ts = tangent_from_world(T, B, N, -I)
    light_ts = tangent_from_world(T, B, N, L)
    H = _normalize(L - I)
    h_ts = tangent_from_world(T, B, N, H)
    f_cos, pdf = eval_ggx_specular_ts(
        view_ts, h_ts, light_ts, alpha, spec_ior, spec_F0, col, col90
    )
    return jnp.where(smooth[..., None], 0.0, f_cos), jnp.where(smooth, 0.0, pdf)


def sample_ggx_specular(T, B, N, I, alpha, spec_ior, spec_F0, col, col90, rand):
    """Bounded-VNDF sample; smooth surfaces degenerate to a mirror delta
    (ShadeRef.cpp:508-538)."""
    smooth = alpha[..., 0] * alpha[..., 1] < 1e-7
    alpha = _benign_alpha(alpha, smooth)
    # rough path
    view_ts = _normalize(tangent_from_world(T, B, N, -I))
    h_ts = sample_ggx_vndf_bounded(view_ts, alpha, rand)
    d_n_v = -dot(h_ts, view_ts, False)
    refl_ts = _normalize(reflect(-view_ts, h_ts, d_n_v))
    dir_rough = world_from_tangent(T, B, N, refl_ts)
    f_rough, pdf_rough = eval_ggx_specular_ts(
        view_ts, h_ts, refl_ts, alpha, spec_ior, spec_F0, col, col90
    )
    # mirror path
    n_dot_i = dot(N, I, False)
    dir_mirror = reflect(I, N, n_dot_i)
    FH = (fresnel_dielectric_cos(dot(dir_mirror, N, False), spec_ior) - spec_F0) / (
        jnp.maximum(1.0 - spec_F0, 1e-6)
    )
    f_mirror = (col + FH[..., None] * (col90 - col)) * DELTA_PDF
    return (
        jnp.where(smooth[..., None], dir_mirror, dir_rough),
        jnp.where(smooth[..., None], f_mirror, f_rough),
        jnp.where(smooth, DELTA_PDF, pdf_rough),
    )


# --------------------------------------------------------------------------
# GGX refraction
# --------------------------------------------------------------------------

def eval_ggx_refraction_ts(view_ts, h_ts, refr_ts, alpha, eta, refr_col):
    """(ShadeRef.cpp:534-560); ``eta`` = n_outside / n_inside along the ray."""
    valid = (refr_ts[..., 2] < 0.0) & (view_ts[..., 2] > 0.0) & (
        alpha[..., 0] * alpha[..., 1] >= 1e-7
    )
    D = D_GGX(h_ts, alpha)
    G1o = G1(refr_ts, alpha)
    G1i = G1(view_ts, alpha)
    denom = dot(refr_ts, h_ts, False) + dot(view_ts, h_ts, False) * eta
    jacobian = safe_div_pos(
        jnp.maximum(-dot(refr_ts, h_ts, False), 0.0), denom * denom
    )
    vh = jnp.maximum(dot(view_ts, h_ts, False), 0.0)
    F = D * G1i * G1o * vh * jacobian / jnp.maximum(view_ts[..., 2], 1e-7)
    pdf = D * G1o * vh * jacobian / jnp.maximum(view_ts[..., 2], 1e-7)
    f_cos = jnp.where(valid[..., None], F[..., None] * refr_col, 0.0)
    return f_cos, jnp.where(valid, pdf, 0.0)


def eval_ggx_refraction(T, B, N, I, L, alpha, eta, refr_col):
    smooth = alpha[..., 0] * alpha[..., 1] < 1e-7
    alpha = _benign_alpha(alpha, smooth)
    view_ts = tangent_from_world(T, B, N, -I)
    light_ts = tangent_from_world(T, B, N, L)
    H = _normalize(L - I * eta[..., None])
    h_ts = tangent_from_world(T, B, N, H)
    f, pdf = eval_ggx_refraction_ts(view_ts, h_ts, light_ts, alpha, eta,
                                    refr_col)
    # delta lobes are excluded from NEE (ShadeRef.cpp:865-876 gates on
    # alpha >= 1e-7); the benign alpha above exists only to keep masked
    # lanes' gradients finite, so zero them explicitly — evaluating the
    # 0.01-alpha stand-in here NEE'd smooth glass through a sharp lobe
    # (+11% on lights seen through glass, halo fireflies)
    return (jnp.where(smooth[..., None], 0.0, f),
            jnp.where(smooth, 0.0, pdf))


def sample_ggx_refraction(T, B, N, I, alpha, eta, refr_col, rand):
    """(ShadeRef.cpp:562-595).  Returns (dir, f_cos, pdf); total internal
    reflection yields zero weight."""
    smooth = alpha[..., 0] * alpha[..., 1] < 1e-7
    alpha = _benign_alpha(alpha, smooth)
    # smooth (delta) path
    n_dot_i = dot(N, I, False)
    cosi = -n_dot_i
    cost2 = 1.0 - eta * eta * (1.0 - cosi * cosi)
    # 1e-12 floor: sqrt'(0)=inf would NaN the masked-TIR lanes' gradients
    m = eta * cosi - jnp.sqrt(jnp.maximum(cost2, 1e-12))
    dir_delta = _normalize(eta[..., None] * I + m[..., None] * N)
    ok_delta = cost2 >= 0.0
    f_delta = jnp.where(ok_delta[..., None], refr_col * DELTA_PDF, 0.0)

    # rough path
    view_ts = _normalize(tangent_from_world(T, B, N, -I))
    h_ts = sample_ggx_vndf(view_ts, alpha, rand)
    cosi_r = dot(view_ts, h_ts, False)
    cost2_r = 1.0 - eta * eta * (1.0 - cosi_r * cosi_r)
    m_r = eta * cosi_r - jnp.sqrt(jnp.maximum(cost2_r, 1e-12))
    refr_ts = _normalize(-eta[..., None] * view_ts + m_r[..., None] * h_ts)
    dir_rough = world_from_tangent(T, B, N, refr_ts)
    f_rough, pdf_rough = eval_ggx_refraction_ts(
        view_ts, h_ts, refr_ts, alpha, eta, refr_col
    )
    ok_rough = cost2_r >= 0.0
    f_rough = jnp.where(ok_rough[..., None], f_rough, 0.0)

    return (
        jnp.where(smooth[..., None], dir_delta, dir_rough),
        jnp.where(smooth[..., None], f_delta, f_rough),
        jnp.where(smooth, DELTA_PDF, jnp.where(ok_rough, pdf_rough, 0.0)),
    )


# --------------------------------------------------------------------------
# Clearcoat (GTR1)
# --------------------------------------------------------------------------

def eval_clearcoat_ts(view_ts, h_ts, refl_ts, coat_roughness2, coat_ior, coat_F0):
    """(ShadeRef.cpp:597-617): GTR1 NDF, fixed 0.25²-alpha Smith masking."""
    D = D_GTR1(h_ts[..., 2], coat_roughness2)
    coat_alpha = jnp.broadcast_to(
        jnp.float32(0.25 * 0.25), view_ts[..., 2].shape + (2,)
    )
    G = G1(view_ts, coat_alpha) * G1(refl_ts, coat_alpha)
    FH = (fresnel_dielectric_cos(dot(refl_ts, h_ts, False), coat_ior) - coat_F0) / (
        jnp.maximum(1.0 - coat_F0, 1e-6)
    )
    F = 0.04 + FH * (1.0 - 0.04)
    denom = 4.0 * jnp.abs(view_ts[..., 2]) * jnp.abs(refl_ts[..., 2])
    F = F * jnp.where(denom != 0.0, D * G / jnp.where(denom != 0.0, denom, 1.0), 0.0)
    F = F * jnp.maximum(refl_ts[..., 2], 0.0)
    alpha2 = jnp.stack([coat_roughness2, coat_roughness2], axis=-1)
    pdf = ggx_vndf_reflection_bounded_pdf(D, view_ts, alpha2)
    return F, pdf


def eval_clearcoat(T, B, N, I, L, coat_roughness2, coat_ior, coat_F0):
    smooth = sqr(coat_roughness2) < 1e-7
    coat_roughness2 = jnp.where(smooth, 0.01, coat_roughness2)
    view_ts = tangent_from_world(T, B, N, -I)
    light_ts = tangent_from_world(T, B, N, L)
    H = _normalize(L - I)
    h_ts = tangent_from_world(T, B, N, H)
    f, pdf = eval_clearcoat_ts(view_ts, h_ts, light_ts, coat_roughness2, coat_ior, coat_F0)
    return jnp.where(smooth, 0.0, f), jnp.where(smooth, 0.0, pdf)


def sample_clearcoat(T, B, N, I, coat_roughness2, coat_ior, coat_F0, rand):
    """(ShadeRef.cpp:619-645); GGX-VNDF sampled though the NDF is GTR1,
    matching Cycles (and the reference's note)."""
    smooth = sqr(coat_roughness2) < 1e-7
    coat_roughness2 = jnp.where(smooth, 0.01, coat_roughness2)
    view_ts = _normalize(tangent_from_world(T, B, N, -I))
    alpha2 = jnp.stack([coat_roughness2, coat_roughness2], axis=-1)
    h_ts = sample_ggx_vndf_bounded(view_ts, alpha2, rand)
    d_n_v = -dot(h_ts, view_ts, False)
    refl_ts = _normalize(reflect(-view_ts, h_ts, d_n_v))
    dir_rough = world_from_tangent(T, B, N, refl_ts)
    f_rough, pdf_rough = eval_clearcoat_ts(
        view_ts, h_ts, refl_ts, coat_roughness2, coat_ior, coat_F0
    )
    # mirror path
    n_dot_i = dot(N, I, False)
    dir_mirror = reflect(I, N, n_dot_i)
    FH = (fresnel_dielectric_cos(dot(dir_mirror, N, False), coat_ior) - coat_F0) / (
        jnp.maximum(1.0 - coat_F0, 1e-6)
    )
    f_mirror = (0.04 + FH * (1.0 - 0.04)) * DELTA_PDF
    return (
        jnp.where(smooth[..., None], dir_mirror, dir_rough),
        jnp.where(smooth, f_mirror, f_rough),
        jnp.where(smooth, DELTA_PDF, pdf_rough),
    )
