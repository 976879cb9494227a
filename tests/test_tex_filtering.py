"""Texture filtering: stochastic single-tap + anisotropic ray-cone filter.

The reference's default sampler is stochastic single-tap filtering
(USE_STOCH_TEXTURE_FILTERING, CoreRef.cpp:19,2870-2875) with ray-cone mip
selection; its CPU core also lists an anisotropic mode
(CoreRef.h:465-474).  Gates here:

  * stochastic == bilinear in expectation (same converged image);
  * at a grazing view of a high-frequency checker, the anisotropic filter
    is closer to ground truth (4x-supersampled render, box-downsampled)
    than the isotropic filter at equal spp — less aliasing.
"""

import dataclasses

import numpy as np
import pytest

from ray_tpu.render.integrator import PassSettings
from ray_tpu.render.renderer import Renderer, RenderSettings
from ray_tpu.scene.camera import make_camera
from ray_tpu.scene.materials import MaterialDesc, ShadingNode
from ray_tpu.scene.scene import Scene


def _checker_floor_scene():
    sc = Scene()
    res = 256
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    checker = (((xx // 8) + (yy // 8)) % 2).astype(np.float32)
    tex = np.stack([checker] * 3, axis=-1) * 0.8 + 0.1
    tid = sc.add_texture(tex, generate_mips=True)
    mat = sc.add_material(MaterialDesc(
        type=ShadingNode.DIFFUSE, base_color=(1, 1, 1), roughness=0.0,
        base_texture=tid))
    # grazing regime: uv scale + camera height tuned so the cone's MINOR
    # footprint is ~1 texel (checker sharp across the view direction)
    # while the MAJOR axis spans several checker periods — the isotropic
    # mip must either alias (minor-based) or blur (major-based)
    sc.add_mesh(
        vertices=[[-40, 0, -5], [40, 0, -5], [40, 0, 75], [-40, 0, 75]],
        indices=[[0, 2, 1], [0, 3, 2]],
        uvs=[[0, 0], [2, 0], [2, 2], [0, 2]],
        material=mat)
    sc.set_environment((1.0, 1.0, 1.0))
    cam = make_camera(origin=(0, 0.25, 0), look_at=(0, 0.0, 20), fov=40)
    return sc.finalize(), cam


def _render(scene, cam, res, spp, tex_filter):
    r = Renderer(
        RenderSettings(res, res),
        PassSettings(max_total_depth=1, min_total_depth=1,
                     tex_filter=tex_filter),
    )
    return r.render(scene, cam, spp)


@pytest.fixture(scope="module")
def checker():
    return _checker_floor_scene()


def test_stochastic_matches_bilinear_in_expectation(checker):
    scene, cam = checker
    a = _render(scene, cam, 32, 192, "stochastic")
    b = _render(scene, cam, 32, 48, "bilinear")
    # same converged image (both use the same mip chain)
    assert np.abs(a.mean() - b.mean()) / b.mean() < 0.02
    rmse = float(np.sqrt(((a - b) ** 2).mean()))
    assert rmse < 0.06, rmse


def test_aniso_beats_isotropic_at_grazing(checker):
    """At high spp the pixel filter itself averages the elongated
    footprint, so the aniso filter's win is CONVERGENCE: at low spp the
    isotropic minor-axis mip leaves sharp stripes that sample as noise /
    aliasing, while the aniso tap pre-integrates the major axis."""
    scene, cam = checker
    res, spp = 48, 8
    # ground truth: 4x supersampled, box-downsampled (the pixel integral)
    truth_hi = _render(scene, cam, 4 * res, 32, "stochastic")
    truth = truth_hi.reshape(res, 4, res, 4, 3).mean(axis=(1, 3))

    iso = _render(scene, cam, res, spp, "stochastic")
    aniso = _render(scene, cam, res, spp, "stochastic_aniso")
    mse_iso = float(((iso - truth) ** 2).mean())
    mse_aniso = float(((aniso - truth) ** 2).mean())
    print(f"grazing checker MSE: iso {mse_iso:.5f} aniso {mse_aniso:.5f}")
    assert mse_aniso < mse_iso, (mse_aniso, mse_iso)
