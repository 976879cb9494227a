"""Differentiable physical sky / atmosphere.

Capability counterpart of the reference's procedural sky
(internal/AtmosphereRef.cpp ``IntegrateScattering`` + SceneCommon.cpp:186
transmittance/multiscatter LUT bake; parameter struct SceneBase.h:314
``atmosphere_params_t``): a Hillaire-2020-style model — Rayleigh + Mie +
ozone atmosphere, numerically integrated transmittance LUT, isotropic
multiple-scattering LUT, and single-scattering ray march for sky radiance.
Everything is pure jnp, so sky radiance is differentiable w.r.t. every
atmosphere parameter and the sun direction (the samples/05_physical_sky
optimization config in BASELINE.json).

Omissions vs the reference this round (documented in docs/ROADMAP.md):
volumetric cloud layers, cirrus, moon and stars (the reference precomputes
those from baked noise/image tables).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# LUT sizes (reference internal/Constants.inl:150-152)
TRANSMITTANCE_LUT_W = 256
TRANSMITTANCE_LUT_H = 64
MULTISCATTER_LUT_RES = 32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AtmosphereParams:
    """Differentiable atmosphere parameters (defaults = Earth, matching
    SceneBase.h:314)."""

    planet_radius: Any = 6371000.0
    viewpoint_height: Any = 700.0
    atmosphere_height: Any = 100000.0
    rayleigh_height: Any = 8000.0
    mie_height: Any = 1200.0
    ozone_height_center: Any = 25000.0
    ozone_half_width: Any = 15000.0
    atmosphere_density: Any = 1.0
    rayleigh_scattering: Any = (5.802e-6, 13.558e-6, 33.1e-6)
    mie_scattering: Any = (3.996e-6, 3.996e-6, 3.996e-6)
    mie_extinction: Any = (4.44e-6, 4.44e-6, 4.44e-6)
    ozone_absorption: Any = (0.65e-6, 1.881e-6, 0.085e-6)
    ground_albedo: Any = (0.05, 0.05, 0.05)

    def jnp_params(self):
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32), self
        )


SUN_ILLUMINANCE = 1.0  # radiance scale; callers multiply by sun color/power
_PI = np.pi


def _densities(p: AtmosphereParams, h):
    """(rayleigh, mie, ozone) relative densities at altitude h (meters)."""
    h = jnp.maximum(h, 0.0)
    d_r = jnp.exp(-h / p.rayleigh_height)
    d_m = jnp.exp(-h / p.mie_height)
    d_o = jnp.maximum(
        0.0, 1.0 - jnp.abs(h - p.ozone_height_center) / p.ozone_half_width
    )
    return d_r * p.atmosphere_density, d_m * p.atmosphere_density, d_o * p.atmosphere_density


def _extinction(p: AtmosphereParams, h):
    d_r, d_m, d_o = _densities(p, h)
    sig_r = jnp.asarray(p.rayleigh_scattering)
    sig_m_ext = jnp.asarray(p.mie_extinction)
    sig_o = jnp.asarray(p.ozone_absorption)
    return (
        d_r[..., None] * sig_r
        + d_m[..., None] * sig_m_ext
        + d_o[..., None] * sig_o
    )


def _ray_sphere_far(r, mu, radius):
    """Distance to sphere of ``radius`` from height r along cos-angle mu
    (far intersection; NaN-safe)."""
    disc = r * r * (mu * mu - 1.0) + radius * radius
    return jnp.maximum(0.0, -r * mu + jnp.sqrt(jnp.maximum(disc, 0.0)))


def _ray_sphere_near(r, mu, radius):
    disc = r * r * (mu * mu - 1.0) + radius * radius
    ok = disc >= 0.0
    t = -r * mu - jnp.sqrt(jnp.maximum(disc, 0.0))
    return jnp.where(ok & (t > 0.0), t, jnp.inf)


def transmittance_integral(p: AtmosphereParams, r, mu, steps: int = 40):
    """Optical-depth integral from (r, mu) to the top of atmosphere."""
    r_top = p.planet_radius + p.atmosphere_height
    t_max = _ray_sphere_far(r, mu, r_top)
    dt = t_max / steps
    step_idx = (jnp.arange(steps, dtype=jnp.float32) + 0.5).reshape(
        (steps,) + (1,) * jnp.ndim(dt)
    )
    ts = step_idx * dt[None, ...]
    # height along the ray: |o + t·d| with o = (0, r), d angle mu
    h = (
        jnp.sqrt(
            jnp.maximum(
                r[None, ...] ** 2
                + ts * ts
                + 2.0 * r[None, ...] * ts * mu[None, ...],
                1.0,
            )
        )
        - p.planet_radius
    )
    ext = _extinction(p, h)  # (steps, ..., 3)
    tau = jnp.sum(ext * dt[None, ..., None], axis=0)
    return jnp.exp(-tau)


def build_transmittance_lut(p: AtmosphereParams):
    """(H, W, 3) transmittance LUT over the Bruneton (rho, d) mapping."""
    Rg = p.planet_radius
    Rt = p.planet_radius + p.atmosphere_height
    H = jnp.sqrt(jnp.maximum(Rt * Rt - Rg * Rg, 0.0))
    u = (jnp.arange(TRANSMITTANCE_LUT_W, dtype=jnp.float32) + 0.5) / TRANSMITTANCE_LUT_W
    v = (jnp.arange(TRANSMITTANCE_LUT_H, dtype=jnp.float32) + 0.5) / TRANSMITTANCE_LUT_H
    uu, vv = jnp.meshgrid(u, v)  # (H, W)
    rho = vv * H
    r = jnp.sqrt(rho * rho + Rg * Rg)
    d_min = Rt - r
    d_max = rho + H
    d = d_min + uu * (d_max - d_min)
    mu = jnp.where(
        d > 0.0,
        jnp.clip((H * H - rho * rho - d * d) / (2.0 * r * d + 1e-9), -1.0, 1.0),
        1.0,
    )
    return transmittance_integral(p, r, mu)


def lookup_transmittance(p: AtmosphereParams, lut, r, mu):
    """Bilinear LUT fetch with the same mapping as the bake."""
    Rg = p.planet_radius
    Rt = p.planet_radius + p.atmosphere_height
    H = jnp.sqrt(jnp.maximum(Rt * Rt - Rg * Rg, 0.0))
    rho = jnp.sqrt(jnp.maximum(r * r - Rg * Rg, 0.0))
    d = _ray_sphere_far(r, mu, Rt)
    d_min = Rt - r
    d_max = rho + H
    u = jnp.clip((d - d_min) / jnp.maximum(d_max - d_min, 1e-9), 0.0, 1.0)
    v = jnp.clip(rho / jnp.maximum(H, 1e-9), 0.0, 1.0)

    x = u * (TRANSMITTANCE_LUT_W - 1)
    y = v * (TRANSMITTANCE_LUT_H - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, TRANSMITTANCE_LUT_W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, TRANSMITTANCE_LUT_H - 2)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    c00 = lut[y0, x0]
    c10 = lut[y0, x0 + 1]
    c01 = lut[y0 + 1, x0]
    c11 = lut[y0 + 1, x0 + 1]
    return (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )


def _phase_rayleigh(c):
    return 3.0 / (16.0 * _PI) * (1.0 + c * c)


def _phase_mie(c, g=0.8):
    gg = g * g
    denom = jnp.maximum(1.0 + gg - 2.0 * g * c, 1e-6)
    return (3.0 / (8.0 * _PI)) * (1.0 - gg) * (1.0 + c * c) / (
        (2.0 + gg) * denom * jnp.sqrt(denom)
    )


def build_multiscatter_lut(p: AtmosphereParams, trans_lut, dir_samples: int = 64):
    """Hillaire's isotropic multiple-scattering LUT Ψ_ms over
    (sun_cos, altitude) — (RES, RES, 3)."""
    Rg = p.planet_radius
    u = (jnp.arange(MULTISCATTER_LUT_RES, dtype=jnp.float32) + 0.5) / MULTISCATTER_LUT_RES
    sun_cos = u * 2.0 - 1.0                       # (RES,)
    alt = u * p.atmosphere_height                 # (RES,)
    mu_s, r = jnp.meshgrid(sun_cos, Rg + alt)     # (RES, RES)

    # Fibonacci sphere directions
    i = np.arange(dir_samples)
    golden = (1.0 + 5.0**0.5) / 2.0
    phi = 2.0 * np.pi * (i / golden % 1.0)
    cos_t = 1.0 - 2.0 * (i + 0.5) / dir_samples
    sin_t = np.sqrt(np.maximum(1.0 - cos_t**2, 0.0))
    dirs = jnp.asarray(
        np.stack([sin_t * np.cos(phi), cos_t, sin_t * np.sin(phi)], -1),
        jnp.float32,
    )  # (D, 3)

    sun_dir_y = mu_s  # sun in the (x=0) plane: dir = (sqrt(1-mu²), mu, 0)
    sun_dir_x = jnp.sqrt(jnp.maximum(1.0 - mu_s * mu_s, 0.0))

    def one_dir(d):
        mu_v = jnp.broadcast_to(d[1], r.shape)
        cos_sun = d[0] * sun_dir_x + d[1] * sun_dir_y
        L, fms = _march_single(
            p, trans_lut, r, mu_v, cos_sun, sun_mu0=mu_s,
            steps=20, with_fms=True,
        )
        return L, fms

    Ls, fmss = jax.vmap(one_dir)(dirs)  # (D, RES, RES, 3)
    L2 = jnp.mean(Ls, axis=0)
    f_ms = jnp.mean(fmss, axis=0)
    return L2 / jnp.maximum(1.0 - f_ms, 1e-3)


def _march_single(p, trans_lut, r, mu_v, cos_sun, sun_mu0, steps,
                  with_fms=False, psi_lookup=None):
    """Shared single-scattering march used by the MS-LUT bake and the sky
    radiance evaluation.

    ``mu_v``: view cos vs local up at the start; ``cos_sun``: cos between
    view and sun directions; ``sun_mu0``: sun cos vs up at the start.  The
    per-sample sun elevation is exact:
    mu_sun(t) = (r·sun_mu0 + t·cos_sun) / r(t).
    """
    Rg = p.planet_radius
    Rt = p.planet_radius + p.atmosphere_height
    t_ground = _ray_sphere_near(r, mu_v, Rg)
    t_top = _ray_sphere_far(r, mu_v, Rt)
    t_max = jnp.minimum(jnp.where(jnp.isfinite(t_ground), t_ground, t_top), t_top)
    dt = t_max / steps

    sig_r = jnp.asarray(p.rayleigh_scattering)
    sig_m = jnp.asarray(p.mie_scattering)

    p_r = _phase_rayleigh(cos_sun)
    p_m = _phase_mie(cos_sun)

    L = jnp.zeros(r.shape + (3,), jnp.float32)
    f_ms = jnp.zeros(r.shape + (3,), jnp.float32)
    T_acc = jnp.ones(r.shape + (3,), jnp.float32)

    for k in range(steps):
        t = (k + 0.5) * dt
        r_at = jnp.sqrt(
            jnp.maximum(r * r + t * t + 2.0 * r * t * mu_v, 1.0)
        )
        h = r_at - Rg
        mu_sun_at = jnp.clip(
            (r * sun_mu0 + t * cos_sun) / r_at, -1.0, 1.0
        )
        d_r, d_m, d_o = _densities(p, h)
        scat = d_r[..., None] * sig_r + d_m[..., None] * sig_m
        ext = _extinction(p, h)
        T_sun = lookup_transmittance(p, trans_lut, r_at, mu_sun_at)
        # shadowed by the planet below the local horizon
        horizon = -jnp.sqrt(jnp.maximum(r_at * r_at - Rg * Rg, 0.0)) / r_at
        T_sun = jnp.where((mu_sun_at > horizon)[..., None], T_sun, 0.0)

        step_T = jnp.exp(-ext * dt[..., None])
        # analytic in-step integration (Hillaire): S·(1-e^{-ext·dt})/ext
        s_int = (1.0 - step_T) / jnp.maximum(ext, 1e-12)
        phase_scat = (
            d_r[..., None] * sig_r * p_r[..., None]
            + d_m[..., None] * sig_m * p_m[..., None]
        )
        L = L + T_acc * T_sun * phase_scat * s_int
        if psi_lookup is not None:
            psi = psi_lookup(r_at, mu_sun_at)
            L = L + T_acc * psi * scat * s_int
        if with_fms:
            f_ms = f_ms + T_acc * scat * s_int
        T_acc = T_acc * step_T

    # ground bounce (single lambertian event)
    hit_ground = jnp.isfinite(t_ground) & (t_ground <= t_top)
    mu_sun_g = jnp.clip(
        (r * sun_mu0 + t_max * cos_sun) / jnp.maximum(Rg, 1.0), -1.0, 1.0
    )
    T_sun_g = lookup_transmittance(
        p, trans_lut, jnp.broadcast_to(Rg, r.shape), mu_sun_g
    )
    albedo = jnp.asarray(p.ground_albedo)
    ground = (
        T_acc * T_sun_g * jnp.maximum(mu_sun_g, 0.0)[..., None] * albedo / _PI
    )
    L = L + jnp.where(hit_ground[..., None], ground, 0.0)
    return L, f_ms


def lookup_multiscatter(p: AtmosphereParams, ms_lut, r, mu_sun):
    u = jnp.clip((mu_sun + 1.0) * 0.5, 0.0, 1.0)
    v = jnp.clip((r - p.planet_radius) / p.atmosphere_height, 0.0, 1.0)
    x = u * (MULTISCATTER_LUT_RES - 1)
    y = v * (MULTISCATTER_LUT_RES - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, MULTISCATTER_LUT_RES - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, MULTISCATTER_LUT_RES - 2)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    return (
        ms_lut[y0, x0] * (1 - fx) * (1 - fy)
        + ms_lut[y0, x0 + 1] * fx * (1 - fy)
        + ms_lut[y0 + 1, x0] * (1 - fx) * fy
        + ms_lut[y0 + 1, x0 + 1] * fx * fy
    )


def sky_radiance(p: AtmosphereParams, trans_lut, ms_lut, view_dir, sun_dir,
                 sun_color, steps: int = 24, sun_angular_radius: float = 0.00465,
                 include_sun_disk: bool = True):
    """Sky radiance along world-space ``view_dir`` (..., 3) for a viewer at
    ``viewpoint_height`` — single scattering + multiscatter + sun disk.

    The counterpart of the reference's ``IntegrateScattering``
    (AtmosphereRef.h:17)."""
    r0 = p.planet_radius + p.viewpoint_height
    mu_v = view_dir[..., 1]
    r = jnp.broadcast_to(r0, mu_v.shape)

    sun_mu0 = sun_dir[1]
    cos_sun = jnp.clip(
        jnp.sum(view_dir * sun_dir.reshape((1,) * (view_dir.ndim - 1) + (3,)),
                axis=-1),
        -1.0, 1.0,
    )
    L, _ = _march_single(
        p, trans_lut, r, mu_v, cos_sun, sun_mu0=sun_mu0, steps=steps,
        psi_lookup=lambda r_at, mu_s2: lookup_multiscatter(p, ms_lut, r_at, mu_s2),
    )
    L = L * sun_color

    if not include_sun_disk:
        return L
    # sun disk through transmittance (reference draws the sun via its own
    # dir light; for env bakes we include the attenuated disk)
    in_disk = cos_sun > np.cos(sun_angular_radius)
    T_view = lookup_transmittance(p, trans_lut, r, jnp.clip(mu_v, -1.0, 1.0))
    hits_ground = jnp.isfinite(_ray_sphere_near(r, mu_v, p.planet_radius))
    disk_rad = sun_color / (_PI * sun_angular_radius**2)
    L = L + jnp.where(
        (in_disk & (~hits_ground))[..., None], T_view * disk_rad, 0.0
    )
    return L


def bake_sky_env(p: AtmosphereParams, sun_dir, sun_color, width=256, height=128,
                 steps: int = 24, include_sun_disk: bool = True):
    """Bake the sky to a latlong env image (H, W, 3) — the analogue of
    ``CalcSkyEnvTexture`` (SceneCommon.h:25)."""
    p = p.jnp_params()
    sun_dir = jnp.asarray(sun_dir, jnp.float32)
    sun_dir = sun_dir / jnp.linalg.norm(sun_dir)
    sun_color = jnp.asarray(sun_color, jnp.float32)
    trans_lut = build_transmittance_lut(p)
    ms_lut = build_multiscatter_lut(p, trans_lut)

    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    uu, vv = jnp.meshgrid(u, v)
    theta = vv * _PI
    phi = uu * 2.0 * _PI
    d = jnp.stack(
        [jnp.sin(theta) * jnp.cos(phi), jnp.cos(theta), jnp.sin(theta) * jnp.sin(phi)],
        axis=-1,
    )
    return sky_radiance(p, trans_lut, ms_lut, d, sun_dir, sun_color, steps=steps,
                        include_sun_disk=include_sun_disk)
