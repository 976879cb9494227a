"""Gradient validation vs finite differences (BASELINE.json gradient metric).

Pixel gradients w.r.t. material base color, emission strength and environment
color must match central finite differences.  Because sampling is detached
(same RNG stream for every parameter value), FD of the *same-seed* estimator
is exact up to fp error for interior terms — no MC noise in the comparison.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tpu.render.integrator import PassSettings, render_tile
from ray_tpu.scene.camera import build_filter_table
from ray_tpu.utils.test_scenes import cornell_scene

RES = 16
SETTINGS = PassSettings(max_total_depth=3, min_total_depth=3)


@pytest.fixture(scope="module")
def setup():
    sc, cam = cornell_scene("emissive_quad")
    scene = sc.finalize()
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    return scene, cam, table


def _image(scene, cam, table):
    out = render_tile(
        scene, cam, table, jnp.int32(0), jnp.int32(0),
        jnp.uint32(1), jnp.uint32(0),
        width=RES, height=RES, tile_w=RES, tile_h=RES,
        settings=SETTINGS, use_filter_table=False,
    )
    return out["color"]


def _check_fd(setup, get, put, eps, rtol=0.05, atol=1e-4):
    """Compare AD gradient of mean radiance wrt a scalar against central FD."""
    scene, cam, table = setup

    def loss(theta):
        return jnp.mean(_image(put(scene, theta), cam, table))

    theta0 = get(scene)
    g_ad = jax.grad(loss)(theta0)
    f_p = loss(theta0 + eps)
    f_m = loss(theta0 - eps)
    g_fd = (f_p - f_m) / (2 * eps)
    np.testing.assert_allclose(
        float(g_ad), float(g_fd), rtol=rtol, atol=atol
    ), (g_ad, g_fd)
    return float(g_ad)


def _with_mat_col(scene, col, value):
    mats = dict(scene.materials)
    mats[col] = value
    return dataclasses.replace(scene, materials=mats)


def test_grad_base_color_vs_fd(setup):
    scene, _, _ = setup

    def get(s):
        return s.materials["base_color"][0, 0]

    def put(s, th):
        bc = s.materials["base_color"].at[0, 0].set(th)
        return _with_mat_col(s, "base_color", bc)

    g = _check_fd(setup, get, put, eps=1e-3)
    assert g > 0.0  # brighter walls → brighter image


def test_grad_emission_strength_vs_fd(setup):
    scene, _, _ = setup
    emis_id = 4  # cornell_scene registers the emissive material last

    def get(s):
        return s.materials["strength"][emis_id]

    def put(s, th):
        st = s.materials["strength"].at[emis_id].set(th)
        return _with_mat_col(s, "strength", st)

    g = _check_fd(setup, get, put, eps=1e-2)
    assert g > 0.0


def test_grad_env_color_vs_fd(setup):
    scene, _, _ = setup

    def get(s):
        return s.env_col[1]

    def put(s, th):
        return dataclasses.replace(s, env_col=s.env_col.at[1].set(th))

    # env starts at 0; nudge to a positive base point
    base = dataclasses.replace(scene, env_col=jnp.array([0.2, 0.2, 0.2]))
    setup2 = (base, setup[1], setup[2])
    g = _check_fd(setup2, get, put, eps=1e-3)
    assert g > 0.0


def test_grad_roughness_vs_fd(setup):
    scene, _, _ = setup

    def get(s):
        return s.materials["roughness"][0]

    def put(s, th):
        r = s.materials["roughness"].at[0].set(th)
        return _with_mat_col(s, "roughness", r)

    # base point away from 0 so the Oren term is active
    base = _with_mat_col(
        scene, "roughness", scene.materials["roughness"].at[0].set(0.3)
    )
    _check_fd((base, setup[1], setup[2]), get, put, eps=1e-3)


def test_grad_finite_everywhere(setup):
    """Gradients of every float material column and env are finite."""
    scene, cam, table = setup

    mat_float = {
        k: v for k, v in scene.materials.items()
        if jnp.issubdtype(v.dtype, jnp.floating)
    }

    def loss(params):
        mats = dict(scene.materials)
        mats.update(params["m"])
        s = dataclasses.replace(
            scene, materials=mats, env_col=params["e"]
        )
        return jnp.mean(_image(s, cam, table))

    grads = jax.grad(loss)({"m": mat_float, "e": scene.env_col})
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        assert np.isfinite(np.asarray(leaf)).all(), path


def test_grad_checkpoint_policies_agree(setup):
    """The three residual policies (stored, remat+trace, remat+trace+dots)
    compute the same gradient — they differ only in what the backward pass
    saves vs recomputes (detached RNG makes the replay exact).  Guards the
    bench.py policy sweep (ROADMAP perf #2): the flagship rides stored
    residuals, the big scene path-replay remat."""
    scene, cam, table = setup

    def loss_for(settings):
        def loss(theta):
            mats = dict(scene.materials)
            mats["base_color"] = mats["base_color"].at[0].set(theta)
            s = dataclasses.replace(scene, materials=mats)
            out = render_tile(
                s, cam, table, jnp.int32(0), jnp.int32(0),
                jnp.uint32(1), jnp.uint32(0),
                width=RES, height=RES, tile_w=RES, tile_h=RES,
                settings=settings, use_filter_table=False,
            )
            return jnp.mean(out["color"])
        return loss

    theta0 = scene.materials["base_color"][0]
    g_stored = jax.grad(loss_for(SETTINGS))(theta0)
    g_remat = jax.grad(loss_for(
        dataclasses.replace(SETTINGS, remat=True)))(theta0)
    g_dots = jax.grad(loss_for(
        dataclasses.replace(SETTINGS, remat=True, remat_save_dots=True)
    ))(theta0)
    np.testing.assert_allclose(
        np.asarray(g_remat), np.asarray(g_stored), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(g_dots), np.asarray(g_stored), rtol=1e-5, atol=1e-7)
