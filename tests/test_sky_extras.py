"""Sky celestial bodies & clouds (reference AtmosphereRef.cpp moon/stars/
cirrus/cloud features, parameters SceneBase.h:320-336): moon disk with
phase, procedural star field, cirrus layer, volumetric cumulus march —
plus differentiability of the cloud parameters."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ray_tpu.render.sky import (
    AtmosphereParams,
    bake_sky_env,
    build_multiscatter_lut,
    build_transmittance_lut,
    clouds_march,
    moon_radiance,
    sky_radiance_full,
    stars_radiance,
)

SUN_UP = np.array([0.3, 0.8, 0.2])
SUN_DOWN = np.array([0.2, -0.5, 0.1])
SUN_COL = (20.0, 20.0, 20.0)


def _dirs(n=256, up_only=True):
    rng = np.random.default_rng(5)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    if up_only:
        d[:, 1] = np.abs(d[:, 1])
    return jnp.asarray(d.astype(np.float32))


def test_moon_disk_and_phase():
    p = AtmosphereParams(
        moon_dir=(0.0, 0.5, 0.8), moon_radius=1737400.0,
        moon_distance=100000000.0,
    ).jnp_params()
    md = np.array([0.0, 0.5, 0.8])
    md /= np.linalg.norm(md)
    # full moon: sun behind the viewer (opposite the moon)
    rad_full, mask = moon_radiance(
        p, jnp.asarray(md[None, :].astype(np.float32)),
        jnp.asarray(-md.astype(np.float32)),
    )
    assert bool(mask[0])
    assert float(rad_full[0].sum()) > 0
    # new moon: sun behind the moon → dark disk
    rad_new, _ = moon_radiance(
        p, jnp.asarray(md[None, :].astype(np.float32)),
        jnp.asarray(md.astype(np.float32)),
    )
    assert float(rad_new[0].sum()) < float(rad_full[0].sum()) * 0.05
    # off-disk direction → zero
    off = np.array([1.0, 0.0, 0.0], np.float32)
    rad_off, mask_off = moon_radiance(p, jnp.asarray(off[None, :]), jnp.asarray(-md.astype(np.float32)))
    assert not bool(mask_off[0])
    assert float(rad_off[0].sum()) == 0.0


def test_star_field():
    p = AtmosphereParams(stars_brightness=1.0).jnp_params()
    d = _dirs(1 << 14)
    s = np.asarray(stars_radiance(p, d))
    assert (s >= 0).all()
    assert (s.sum(-1) > 1e-4).mean() > 0.001   # some stars
    assert (s.sum(-1) < 1e-6).mean() > 0.5     # mostly empty sky
    p0 = dataclasses.replace(
        AtmosphereParams(stars_brightness=0.0)
    ).jnp_params()
    assert float(np.asarray(stars_radiance(p0, d)).max()) == 0.0


def test_clouds_march_energy():
    p = AtmosphereParams(clouds_density=0.7).jnp_params()
    lut = build_transmittance_lut(p)
    d = _dirs(512)
    sun = jnp.asarray((SUN_UP / np.linalg.norm(SUN_UP)).astype(np.float32))
    L, T = clouds_march(p, lut, d, sun, jnp.asarray(SUN_COL, jnp.float32),
                        steps=8, light_steps=2)
    L = np.asarray(L)
    T = np.asarray(T)
    assert np.isfinite(L).all() and np.isfinite(T).all()
    assert (T >= 0).all() and (T <= 1.0 + 1e-6).all()
    assert (T < 0.999).any()                   # some occlusion happens
    assert (L >= 0).all() and L.sum() > 0      # some in-scatter
    # zero density → no clouds at all
    p0 = AtmosphereParams(clouds_density=0.0).jnp_params()
    L0, T0 = clouds_march(p0, lut, d, sun, jnp.asarray(SUN_COL, jnp.float32),
                          steps=8, light_steps=2)
    assert float(np.abs(np.asarray(T0) - 1.0).max()) < 1e-5
    assert float(np.asarray(L0).max()) < 1e-6


def test_full_sky_composites():
    img_plain = np.asarray(bake_sky_env(
        AtmosphereParams(), SUN_UP, SUN_COL, width=32, height=16, steps=8,
    ))
    img_full = np.asarray(bake_sky_env(
        AtmosphereParams(), SUN_UP, SUN_COL, width=32, height=16, steps=8,
        full=True, cloud_steps=6,
    ))
    assert np.isfinite(img_full).all()
    assert img_full.shape == img_plain.shape
    # features change the image but keep its energy in the same ballpark
    assert np.abs(img_full - img_plain).max() > 1e-4
    assert img_full.mean() < img_plain.mean() * 10 + 1.0


def test_night_sky_stars_visible():
    p = AtmosphereParams().jnp_params()
    lut = build_transmittance_lut(p)
    ms = build_multiscatter_lut(p, lut)
    d = _dirs(1 << 12)
    sun = jnp.asarray(
        (SUN_DOWN / np.linalg.norm(SUN_DOWN)).astype(np.float32)
    )
    L = np.asarray(sky_radiance_full(
        p, lut, ms, d, sun, jnp.asarray(SUN_COL, jnp.float32), steps=8,
        clouds=False, cirrus=False, moon=False,
    ))
    # at night the only energy is stars: sparse bright points
    lum = L.sum(-1)
    assert (lum > 1e-5).mean() < 0.2
    assert lum.max() > 1e-4


def test_cloud_density_gradient():
    p = AtmosphereParams().jnp_params()
    lut = build_transmittance_lut(p)
    d = _dirs(128)
    sun = jnp.asarray((SUN_UP / np.linalg.norm(SUN_UP)).astype(np.float32))

    def mean_rad(density):
        pp = dataclasses.replace(p, clouds_density=density)
        L, T = clouds_march(pp, lut, d, sun,
                            jnp.asarray(SUN_COL, jnp.float32),
                            steps=6, light_steps=2)
        return jnp.mean(L)

    g = jax.grad(mean_rad)(jnp.float32(0.5))
    assert np.isfinite(float(g)) and abs(float(g)) > 0
