"""Microfacet building blocks: GGX distribution, Smith masking, bounded-VNDF
sampling, dielectric Fresnel.

Equations follow the published sources the reference also uses:
Heitz, "Sampling the GGX Distribution of Visible Normals" (JCGT 2018);
Dupuy & Benyoub, "Sampling Visible GGX Normals with Spherical Caps"
(arXiv 2306.05044); Eto & Tokuyoshi, "Bounded VNDF Sampling for Smith-GGX
Reflections" (SIGGRAPH Asia 2023).  Parity target: reference
internal/ShadeRef.cpp:120-250 (same papers, same conventions: tangent space
with +Z = shading normal, ``alpha`` is a 2-vector for anisotropy).
"""

from __future__ import annotations

import jax.numpy as jnp

from ray_tpu.ops.linalg import safe_div_pos, saturate, sqr

PI = 3.14159265358979323846


def calc_alpha(roughness, anisotropy, regularize_alpha):
    """roughness² split into anisotropic (ax, ay); optional path-space
    regularization floor (reference ShadeRef.cpp:12-19)."""
    roughness2 = sqr(roughness)
    aspect = jnp.sqrt(1.0 - 0.9 * anisotropy)
    ax = jnp.maximum(roughness2 / aspect, regularize_alpha)
    ay = jnp.maximum(roughness2 * aspect, regularize_alpha)
    return jnp.stack([ax, ay], axis=-1)


def schlick_weight(u):
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    return sqr(sqr(m)) * m


def fresnel_dielectric_cos(cosi, eta):
    """Exact dielectric Fresnel from cos(incident) and relative IOR
    (Cycles convention, reference ShadeRef.cpp:54-75)."""
    c = jnp.abs(cosi)
    g2 = eta * eta - 1.0 + c * c
    g = jnp.sqrt(jnp.maximum(g2, 1e-12))
    A = (g - c) / jnp.where(g + c != 0.0, g + c, 1.0)
    B = (c * (g + c) - 1.0) / jnp.where(c * (g - c) + 1.0 != 0.0, c * (g - c) + 1.0, 1.0)
    result = 0.5 * A * A * (1.0 + B * B)
    return jnp.where(g2 > 0.0, result, 1.0)  # total internal reflection


def D_GGX(h_ts, alpha):
    """Anisotropic GGX NDF of a tangent-space half vector.

    Alpha is clamped away from zero *inside* the divisions: perfectly smooth
    lobes are select-masked by callers, but an unclamped 1/0 here turns into
    inf partials and poisons gradients through the masked branch
    (inf × zero-cotangent = NaN in the multiply vjp)."""
    hz = h_ts[..., 2]
    safe_hz = jnp.where(hz != 0.0, hz, 1.0)
    a0 = jnp.maximum(alpha[..., 0], 1e-9)
    a1 = jnp.maximum(alpha[..., 1], 1e-9)
    sx = -h_ts[..., 0] / (safe_hz * a0)
    sy = -h_ts[..., 1] / (safe_hz * a1)
    s1 = 1.0 + sx * sx + sy * sy
    cos4 = jnp.maximum(sqr(sqr(hz)), 1e-20)
    d = 1.0 / (sqr(s1) * PI * a0 * a1 * cos4)
    return jnp.where(hz != 0.0, d, 0.0)


def G1(v_ts, alpha):
    """Smith masking term Λ-form for anisotropic GGX."""
    a2 = alpha * alpha
    num = a2[..., 0] * sqr(v_ts[..., 0]) + a2[..., 1] * sqr(v_ts[..., 1])
    delta = (-1.0 + jnp.sqrt(1.0 + safe_div_pos(num, sqr(v_ts[..., 2])))) * 0.5
    return 1.0 / (1.0 + delta)


def D_GTR1(n_dot_h, a):
    """Berry distribution for the clearcoat lobe.  ``a`` is clamped to
    (1e-3, 1-1e-6) inside the log/divide so gradients through masked lanes
    stay finite (log(0) and log(1) are both hazards)."""
    a_c = jnp.clip(a, 1e-3, 0.999999)
    a2 = sqr(a_c)
    t = 1.0 + (a2 - 1.0) * n_dot_h * n_dot_h
    d = (a2 - 1.0) / (PI * jnp.log(a2) * t)
    return jnp.where(a >= 1.0, 1.0 / PI, d)


def _sincos(phi):
    return jnp.sin(phi), jnp.cos(phi)


def sample_vndf_sph_cap(vh, rand):
    """Spherical-cap VNDF hemisphere sampling (Dupuy & Benyoub)."""
    phi = 2.0 * PI * rand[..., 0]
    z = (1.0 - rand[..., 1]) * (1.0 + vh[..., 2]) - vh[..., 2]
    sin_theta = jnp.sqrt(jnp.clip(1.0 - z * z, 1e-12, 1.0))
    sp, cp = _sincos(phi)
    c = jnp.stack([sin_theta * cp, sin_theta * sp, z], axis=-1)
    return c + vh


def sample_vndf_sph_cap_bounded(ve, vh, alpha, rand):
    """Bounded spherical-cap sampling (Eto & Tokuyoshi): shrinks the cap for
    reflection so no sampled normal reflects below the horizon."""
    phi = 2.0 * PI * rand[..., 0]
    a = saturate(jnp.minimum(alpha[..., 0], alpha[..., 1]))
    s = 1.0 + jnp.sqrt(sqr(ve[..., 0]) + sqr(ve[..., 1]))
    a2, s2 = a * a, s * s
    k = (1.0 - a2) * s2 / (s2 + a2 * sqr(ve[..., 2]))
    b = jnp.where(ve[..., 2] > 0.0, k * vh[..., 2], vh[..., 2])
    z = (1.0 - rand[..., 1]) * (1.0 + b) - b
    sin_theta = jnp.sqrt(jnp.clip(1.0 - z * z, 1e-12, 1.0))
    sp, cp = _sincos(phi)
    c = jnp.stack([sin_theta * cp, sin_theta * sp, z], axis=-1)
    return c + vh


def _stretch(v, alpha):
    return jnp.stack(
        [alpha[..., 0] * v[..., 0], alpha[..., 1] * v[..., 1], v[..., 2]], axis=-1
    )


def _normalize(v):
    return v / jnp.sqrt(
        jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-30)
    )


def sample_ggx_vndf(ve_ts, alpha, rand):
    """VNDF sample with PDF D_v(Ne) = G1(Ve) max(0, Ve·Ne) D(Ne) / Ve.z."""
    vh = _normalize(_stretch(ve_ts, alpha))
    nh = sample_vndf_sph_cap(vh, rand)
    ne = jnp.stack(
        [
            alpha[..., 0] * nh[..., 0],
            alpha[..., 1] * nh[..., 1],
            jnp.maximum(nh[..., 2], 0.0),
        ],
        axis=-1,
    )
    return _normalize(ne)


def sample_ggx_vndf_bounded(ve_ts, alpha, rand):
    vh = _normalize(_stretch(ve_ts, alpha))
    nh = sample_vndf_sph_cap_bounded(ve_ts, vh, alpha, rand)
    ne = jnp.stack(
        [
            alpha[..., 0] * nh[..., 0],
            alpha[..., 1] * nh[..., 1],
            jnp.maximum(nh[..., 2], 0.0),
        ],
        axis=-1,
    )
    return _normalize(ne)


def ggx_vndf_reflection_bounded_pdf(d, ve_ts, alpha):
    """PDF of the bounded-VNDF reflection sampler for half-vector density
    ``d`` (Eto & Tokuyoshi eq. 18; reference ShadeRef.cpp:181-194)."""
    ai0 = alpha[..., 0] * ve_ts[..., 0]
    ai1 = alpha[..., 1] * ve_ts[..., 1]
    len2 = jnp.maximum(ai0 * ai0 + ai1 * ai1, 1e-9)
    t = jnp.sqrt(jnp.maximum(len2 + sqr(ve_ts[..., 2]), 1e-18))
    a = saturate(jnp.minimum(alpha[..., 0], alpha[..., 1]))
    s = 1.0 + jnp.sqrt(sqr(ve_ts[..., 0]) + sqr(ve_ts[..., 1]))
    a2, s2 = a * a, s * s
    k = (1.0 - a2) * s2 / (s2 + a2 * sqr(ve_ts[..., 2]))
    pdf_above = d / (2.0 * (k * ve_ts[..., 2] + t))
    pdf_below = d * (t - ve_ts[..., 2]) / (2.0 * len2)
    return jnp.where(ve_ts[..., 2] >= 0.0, pdf_above, pdf_below)


def reflect(i, n, dot_n_i):
    """Mirror reflect direction ``i`` about ``n`` given n·i."""
    return i - 2.0 * dot_n_i[..., None] * n
