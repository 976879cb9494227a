"""Physical sky tests: physical plausibility + differentiability + scene
integration (the samples/05_physical_sky capability)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tpu.render.sky import (
    AtmosphereParams,
    bake_sky_env,
    build_multiscatter_lut,
    build_transmittance_lut,
    lookup_transmittance,
    sky_radiance,
)


@pytest.fixture(scope="module")
def luts():
    p = AtmosphereParams().jnp_params()
    t = build_transmittance_lut(p)
    ms = build_multiscatter_lut(p, t)
    return p, t, ms


def test_transmittance_physical(luts):
    p, t, _ = luts
    arr = np.asarray(t)
    assert np.isfinite(arr).all()
    assert (arr >= 0).all() and (arr <= 1.0 + 1e-5).all()
    # zenith transmittance from the ground: blue attenuated more than red
    r0 = jnp.asarray([p.planet_radius + 700.0])
    T_zen = np.asarray(lookup_transmittance(p, t, r0, jnp.asarray([1.0])))[0]
    assert T_zen[0] > T_zen[2] > 0.0
    # grazing path much more attenuated than zenith
    T_horiz = np.asarray(lookup_transmittance(p, t, r0, jnp.asarray([0.02])))[0]
    assert T_horiz[0] < T_zen[0]


def test_sky_colors(luts):
    p, t, ms = luts
    sun = jnp.asarray([0.0, 0.9, 0.43589])
    sun = sun / jnp.linalg.norm(sun)
    dirs = jnp.asarray([
        [0.0, 1.0, 0.0],        # zenith
        [0.0, 0.05, 0.9987],    # horizon
    ])
    L = np.asarray(
        sky_radiance(p, t, ms, dirs, sun, jnp.asarray([20.0, 20.0, 20.0]),
                     include_sun_disk=False)
    )
    assert np.isfinite(L).all() and (L >= 0).all()
    zen, hor = L[0], L[1]
    assert zen[2] > zen[0], zen           # day zenith is blue
    assert hor.sum() > zen.sum()          # horizon brighter (aerial persp.)


def test_sunset_reddening(luts):
    p, t, ms = luts
    high_sun = jnp.asarray([0.0, 0.9, 0.436])
    low_sun = jnp.asarray([0.0, 0.04, 0.999])
    toward = jnp.asarray([[0.0, 0.08, 0.9968]])
    col = jnp.asarray([20.0, 20.0, 20.0])
    L_noon = np.asarray(sky_radiance(p, t, ms, toward, high_sun / jnp.linalg.norm(high_sun), col, include_sun_disk=False))[0]
    L_set = np.asarray(sky_radiance(p, t, ms, toward, low_sun / jnp.linalg.norm(low_sun), col, include_sun_disk=False))[0]
    assert L_set[0] / max(L_set[2], 1e-9) > L_noon[0] / max(L_noon[2], 1e-9)


def test_sky_differentiable():
    def mean_sky(density):
        p = AtmosphereParams(atmosphere_density=density).jnp_params()
        img = bake_sky_env(p, (0.0, 0.8, 0.6), (20.0, 20.0, 20.0),
                           width=16, height=8, include_sun_disk=False)
        return jnp.mean(img)

    g = jax.grad(mean_sky)(jnp.float32(1.0))
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_scene_with_physical_sky():
    from ray_tpu.render.integrator import PassSettings
    from ray_tpu.render.renderer import Renderer, RenderSettings
    from ray_tpu.scene.camera import make_camera
    from ray_tpu.scene.materials import MaterialDesc, ShadingNode
    from ray_tpu.scene.scene import Scene
    from ray_tpu.utils.geometry import make_uv_sphere

    sc = Scene()
    mat = sc.add_material(
        MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0.8, 0.8, 0.8), roughness=0.0)
    )
    v, idx, n, uv = make_uv_sphere()
    sc.add_mesh(v, idx, normals=n, uvs=uv, material=mat)
    sc.set_physical_sky(
        sun_direction=(0.4, 0.8, 0.2), sun_color=(15.0, 15.0, 15.0),
        env_res=(64, 32),
    )
    cam = make_camera(origin=(0, 0, -4), look_at=(0, 0, 0), fov=40.0)
    flat = sc.finalize()
    assert flat.env_tab_h == 32
    assert flat.num_lights == 2  # sun dir light + env light

    r = Renderer(RenderSettings(24, 24), PassSettings(max_total_depth=2, min_total_depth=2))
    img = r.render(flat, cam, 8)
    assert np.isfinite(img).all()
    assert img.mean() > 0.05
    # sphere is sun-lit: upper-left (toward sun) brighter than lower-right
    c = 12
    lit = img[4:10, 4:14].mean()
    shadowed = img[16:22, 10:20].mean()
    assert lit > shadowed
