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

Extras beyond the base atmosphere (implemented below, procedurally instead
of the reference's baked noise/image tables): volumetric cloud layers,
cirrus, moon disc and stars — see ``_clouds_*`` / ``_moon_*`` / ``_stars``
and tests/test_sky_extras.py.
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
    # celestial bodies & cloud layers (SceneBase.h:320-336).  The reference
    # feeds these from precomputed noise/weather/moon textures
    # (internal/precomputed/__weather_tex.inl etc.); here the noise fields
    # are procedural (hash-lattice fbm) — no blobs, fully differentiable
    # w.r.t. the float parameters.
    clouds_height_beg: Any = 2000.0
    clouds_height_end: Any = 2500.0
    clouds_variety: Any = 0.5
    clouds_density: Any = 0.5
    clouds_offset_x: Any = 0.0
    clouds_offset_z: Any = 0.0
    cirrus_clouds_amount: Any = 0.5
    cirrus_clouds_height: Any = 6000.0
    stars_brightness: Any = 1.0
    moon_radius: Any = 1737400.0
    moon_distance: Any = 100000000.0
    moon_dir: Any = (0.707, 0.707, 0.0)

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


# ---------------------------------------------------------------------------
# Celestial bodies & clouds (reference: AtmosphereRef.cpp clouds/moon/stars
# sections; parameters SceneBase.h:320-336).  Noise is procedural hash-
# lattice fbm instead of the reference's precomputed 3-D noise textures.
# ---------------------------------------------------------------------------

_U32 = jnp.uint32


def _hash_u32(x):
    x = x.astype(_U32)
    x = x ^ (x >> 16)
    x = x * _U32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * _U32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _lattice(ix, iy, iz, seed):
    """Hash lattice point → float in [0, 1)."""
    h = _hash_u32(
        ix.astype(_U32) * _U32(0x9E3779B1)
        ^ iy.astype(_U32) * _U32(0x85EBCA77)
        ^ iz.astype(_U32) * _U32(0xC2B2AE3D)
        ^ _U32(seed)
    )
    return (h >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _smooth(t):
    return t * t * (3.0 - 2.0 * t)


def value_noise3(pos, seed=0):
    """Trilinear value noise on an integer lattice, pos (..., 3) → [0, 1)."""
    pf = jnp.floor(pos)
    ix = pf[..., 0].astype(jnp.int32)
    iy = pf[..., 1].astype(jnp.int32)
    iz = pf[..., 2].astype(jnp.int32)
    f = _smooth(pos - pf)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    def lerp(a, b, t):
        return a + (b - a) * t

    n000 = _lattice(ix, iy, iz, seed)
    n100 = _lattice(ix + 1, iy, iz, seed)
    n010 = _lattice(ix, iy + 1, iz, seed)
    n110 = _lattice(ix + 1, iy + 1, iz, seed)
    n001 = _lattice(ix, iy, iz + 1, seed)
    n101 = _lattice(ix + 1, iy, iz + 1, seed)
    n011 = _lattice(ix, iy + 1, iz + 1, seed)
    n111 = _lattice(ix + 1, iy + 1, iz + 1, seed)
    return lerp(
        lerp(lerp(n000, n100, fx), lerp(n010, n110, fx), fy),
        lerp(lerp(n001, n101, fx), lerp(n011, n111, fx), fy),
        fz,
    )


def fbm3(pos, octaves=4, seed=0, gain=0.5, lacunarity=2.0):
    total = jnp.zeros(pos.shape[:-1], jnp.float32)
    amp = 1.0
    norm = 0.0
    p = pos
    for o in range(octaves):
        total = total + amp * value_noise3(p, seed + o * 131)
        norm += amp
        amp *= gain
        p = p * lacunarity
    return total / norm


def moon_radiance(p: AtmosphereParams, view_dir, sun_dir):
    """Lambert-shaded moon disk with procedural crater albedo (the
    reference samples __moon_tex.inl, AtmosphereRef.cpp moon branch).
    Returns (..., 3) radiance and the disk mask."""
    moon_dir = jnp.asarray(p.moon_dir, jnp.float32)[:3]
    moon_dir = moon_dir / jnp.maximum(jnp.linalg.norm(moon_dir), 1e-9)
    cos_m = jnp.clip(jnp.sum(view_dir * moon_dir, axis=-1), -1.0, 1.0)
    ang_r = jnp.arctan2(p.moon_radius, p.moon_distance)
    cos_r = jnp.cos(ang_r)
    in_disk = cos_m > cos_r
    # local frame around moon_dir
    a = jnp.where(jnp.abs(moon_dir[1]) < 0.99,
                  jnp.array([0.0, 1.0, 0.0], jnp.float32),
                  jnp.array([1.0, 0.0, 0.0], jnp.float32))
    t1 = jnp.cross(moon_dir, a)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-9)
    t2 = jnp.cross(moon_dir, t1)
    du = jnp.sum(view_dir * t1, axis=-1)
    dv = jnp.sum(view_dir * t2, axis=-1)
    sin_r = jnp.maximum(jnp.sin(ang_r), 1e-9)
    # normalized disk coordinates in [-1, 1]
    x = du / sin_r
    y = dv / sin_r
    z2 = jnp.maximum(1.0 - x * x - y * y, 0.0)
    z = jnp.sqrt(z2)
    # moon surface normal in world space (sphere facing the viewer)
    n = (
        x[..., None] * t1
        + y[..., None] * t2
        - z[..., None] * moon_dir
    )
    phase = jnp.maximum(jnp.sum(n * sun_dir, axis=-1), 0.0)
    crater = 0.6 + 0.4 * fbm3(
        jnp.stack([x, y, z], axis=-1) * 6.0, octaves=4, seed=17
    )
    albedo = 0.12 * crater
    rad = (albedo * phase)[..., None] * jnp.ones((3,), jnp.float32)
    return jnp.where(in_disk[..., None], rad, 0.0), in_disk


def stars_radiance(p: AtmosphereParams, view_dir):
    """Procedural star field: one candidate star per lat-long grid cell
    (hash position/intensity), brightness from ``stars_brightness``
    (SceneBase.h:333; the reference generates stars in its sky shader)."""
    N_U, N_V = 512, 256
    theta = jnp.arccos(jnp.clip(view_dir[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(view_dir[..., 2], view_dir[..., 0])
    u = (phi / (2.0 * _PI) + 0.5) * N_U
    v = (theta / _PI) * N_V
    iu = jnp.floor(u).astype(jnp.int32)
    iv = jnp.floor(v).astype(jnp.int32)
    zero = jnp.zeros_like(iu)
    sx = _lattice(iu, iv, zero, 101)
    sy = _lattice(iu, iv, zero, 211)
    mag = _lattice(iu, iv, zero, 307)
    # star subposition within the cell; tight gaussian falloff
    d2 = (u - iu.astype(jnp.float32) - sx) ** 2 + (
        v - iv.astype(jnp.float32) - sy
    ) ** 2
    core = jnp.exp(-d2 * 60.0)
    # few cells hold a visible star; power-law magnitudes
    lit = mag > 0.92
    intensity = jnp.where(lit, (mag - 0.92) / 0.08, 0.0) ** 4
    rad = (p.stars_brightness * 0.05 * intensity * core)[..., None]
    return rad * jnp.ones((3,), jnp.float32)


def cirrus_coverage(p: AtmosphereParams, view_dir, r):
    """Coverage of the thin high-altitude cirrus layer along the view ray
    (cirrus_clouds_amount/height, SceneBase.h:328-329)."""
    mu = view_dir[..., 1]
    r_top = p.planet_radius + p.cirrus_clouds_height
    t = _ray_sphere_far(r, mu, r_top)
    hits = jnp.isfinite(t) & (mu > 0.02)
    pos = view_dir * jnp.where(hits, t, 0.0)[..., None]
    uv = jnp.stack(
        [pos[..., 0] + p.clouds_offset_x, jnp.zeros_like(mu),
         pos[..., 2] + p.clouds_offset_z], axis=-1
    ) * (1.0 / 8000.0)
    n = fbm3(uv, octaves=5, seed=53)
    cov = jnp.clip((n - (1.0 - p.cirrus_clouds_amount * 0.7)) * 3.0, 0.0, 1.0)
    # fade toward the horizon
    cov = cov * jnp.clip((mu - 0.02) * 8.0, 0.0, 1.0)
    return jnp.where(hits, cov * 0.4, 0.0)


def _hg_phase(c, g):
    g2 = g * g
    return (1.0 - g2) / (4.0 * _PI * jnp.power(1.0 + g2 - 2.0 * g * c, 1.5))


def clouds_march(p: AtmosphereParams, trans_lut, view_dir, sun_dir, sun_color,
                 steps: int = 16, light_steps: int = 3):
    """Volumetric cumulus layer between clouds_height_beg/end
    (SceneBase.h:320-327): fbm density, Beer extinction, short sun-ward
    light march, HG phase.  Returns (in-scattered radiance, transmittance).
    """
    mu = view_dir[..., 1]
    r0 = p.planet_radius + p.viewpoint_height
    r = jnp.broadcast_to(jnp.asarray(r0, jnp.float32), mu.shape)
    t_beg = _ray_sphere_far(r, mu, p.planet_radius + p.clouds_height_beg)
    t_end = _ray_sphere_far(r, mu, p.planet_radius + p.clouds_height_end)
    valid = jnp.isfinite(t_beg) & jnp.isfinite(t_end) & (mu > 0.02)
    t_beg = jnp.where(valid, t_beg, 0.0)
    t_end = jnp.where(valid, jnp.minimum(t_end, t_beg + 30000.0), 0.0)
    seg = (t_end - t_beg) / steps

    thick = jnp.maximum(p.clouds_height_end - p.clouds_height_beg, 1.0)
    freq = 1.0 / 1600.0
    offset = jnp.stack(
        [jnp.asarray(p.clouds_offset_x, jnp.float32),
         jnp.zeros(()), jnp.asarray(p.clouds_offset_z, jnp.float32)],
    )

    def density(pos):
        # height above ground, flat-shell approximation
        h01 = jnp.clip(
            (p.viewpoint_height + pos[..., 1] - p.clouds_height_beg) / thick,
            0.0, 1.0,
        )
        base = fbm3((pos + offset) * freq, octaves=4, seed=7)
        detail = fbm3((pos + offset) * (freq * 3.7), octaves=3, seed=91)
        cover = p.clouds_density * 0.8
        d = jnp.clip(
            (base - (1.0 - cover) - p.clouds_variety * 0.25 * detail) * 4.0,
            0.0, 1.0,
        )
        # round tops/bottoms
        return d * _smooth(jnp.clip(h01 * 4.0, 0.0, 1.0)) * _smooth(
            jnp.clip((1.0 - h01) * 2.5, 0.0, 1.0)
        )

    sigma_t = 0.006  # extinction per meter at density 1
    cos_sun = jnp.clip(jnp.sum(view_dir * sun_dir, axis=-1), -1.0, 1.0)
    phase = 0.7 * _hg_phase(cos_sun, 0.55) + 0.3 * _hg_phase(cos_sun, -0.15)
    sun_T_top = lookup_transmittance(
        p, trans_lut, r, jnp.full(mu.shape, jnp.clip(sun_dir[1], -1.0, 1.0))
    )

    def body(i, carry):
        L, T = carry
        t = t_beg + (i + 0.5) * seg
        pos = view_dir * t[..., None]
        d = jnp.where(valid, density(pos), 0.0)
        ext = jnp.exp(-d * sigma_t * seg)
        # short light march toward the sun
        lt = jnp.ones(mu.shape, jnp.float32)
        for j in range(light_steps):
            lpos = pos + sun_dir * ((j + 0.5) * thick / light_steps)
            lt = lt * jnp.exp(
                -density(lpos) * sigma_t * (thick / light_steps)
            )
        amb = 0.1 + 0.2 * jnp.clip(sun_dir[1], 0.0, 1.0)
        S = (phase * lt)[..., None] * sun_T_top * sun_color + amb
        L = L + T[..., None] * (1.0 - ext)[..., None] * S
        return L, T * ext

    L0 = jnp.zeros(view_dir.shape[:-1] + (3,), jnp.float32)
    T0 = jnp.ones(mu.shape, jnp.float32)
    L, T = jax.lax.fori_loop(0, steps, body, (L0, T0))
    return L, jnp.where(valid, T, 1.0)


def sky_radiance_full(p: AtmosphereParams, trans_lut, ms_lut, view_dir,
                      sun_dir, sun_color, steps: int = 24,
                      include_sun_disk: bool = True, moon: bool = True,
                      stars: bool = True, cirrus: bool = True,
                      clouds: bool = True, cloud_steps: int = 16):
    """Full sky: atmosphere + sun disk + moon + stars + cirrus + volumetric
    clouds, composited far-to-near.  The deluxe counterpart of the
    reference's detailed-sky shading path (AtmosphereRef.cpp
    IntegrateScattering with clouds/moon/stars enabled)."""
    r0 = p.planet_radius + p.viewpoint_height
    mu_v = view_dir[..., 1]
    r = jnp.broadcast_to(jnp.asarray(r0, jnp.float32), mu_v.shape)
    hits_ground = jnp.isfinite(_ray_sphere_near(r, mu_v, p.planet_radius))
    T_view = lookup_transmittance(p, trans_lut, r, jnp.clip(mu_v, -1.0, 1.0))

    # far field behind the atmosphere
    far = jnp.zeros(view_dir.shape[:-1] + (3,), jnp.float32)
    if include_sun_disk:
        sun_ar = 0.00465
        cos_sun = jnp.clip(jnp.sum(view_dir * sun_dir, axis=-1), -1.0, 1.0)
        in_disk = cos_sun > np.cos(sun_ar)
        far = far + jnp.where(
            in_disk[..., None], sun_color / (_PI * sun_ar**2), 0.0
        )
    if moon:
        m_rad, _ = moon_radiance(p, view_dir, sun_dir)
        far = far + m_rad
    if stars:
        far = far + stars_radiance(p, view_dir)

    if cirrus:
        cov = cirrus_coverage(p, view_dir, r)
        sun_T = lookup_transmittance(
            p, trans_lut, r,
            jnp.broadcast_to(jnp.clip(sun_dir[1], -1.0, 1.0), mu_v.shape),
        )
        cirrus_col = sun_T * sun_color * (0.25 / _PI) + 0.05
        far = far * (1.0 - cov[..., None]) + cov[..., None] * cirrus_col

    # atmosphere in-scattering
    L_in = sky_radiance(p, trans_lut, ms_lut, view_dir, sun_dir, sun_color,
                        steps=steps, include_sun_disk=False)
    L = L_in + jnp.where(hits_ground[..., None], 0.0, T_view * far)

    if clouds:
        Lc, Tc = clouds_march(p, trans_lut, view_dir, sun_dir, sun_color,
                              steps=cloud_steps)
        L = Lc + Tc[..., None] * L
    return L


def bake_sky_env(p: AtmosphereParams, sun_dir, sun_color, width=256, height=128,
                 steps: int = 24, include_sun_disk: bool = True,
                 full: bool = False, **features):
    """Bake the sky to a latlong env image (H, W, 3) — the analogue of
    ``CalcSkyEnvTexture`` (SceneCommon.h:25).  ``full=True`` adds moon,
    stars, cirrus and volumetric clouds (kwargs forwarded to
    :func:`sky_radiance_full`)."""
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
    if full:
        return sky_radiance_full(
            p, trans_lut, ms_lut, d, sun_dir, sun_color, steps=steps,
            include_sun_disk=include_sun_disk, **features,
        )
    return sky_radiance(p, trans_lut, ms_lut, d, sun_dir, sun_color, steps=steps,
                        include_sun_disk=include_sun_disk)
