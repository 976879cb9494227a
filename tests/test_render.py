"""End-to-end render validation.

Strategy (mirrors the reference's golden-test philosophy, SURVEY.md §4, with
analytic rather than file-based goldens for phase 1):

* furnace tests — a convex diffuse body in a constant environment must
  reflect exactly albedo × env (validates BSDF normalization, NEE, MIS and
  env sampling *jointly*);
* estimator-consistency — NEE on vs off must converge to the same image
  (validates MIS weights and light pdfs);
* determinism — same seed → bit-identical image (the property path-replay
  backprop depends on).
"""

import numpy as np
import pytest

from ray_tpu.render.integrator import PassSettings
from ray_tpu.render.renderer import Renderer, RenderSettings
from ray_tpu.scene.materials import MaterialDesc, ShadingNode
from ray_tpu.utils.test_scenes import cornell_scene, furnace_scene

RES = 32


def _render(scene_flat, cam, spp, depth=3, use_nee=True, res=RES):
    r = Renderer(
        RenderSettings(res, res),
        PassSettings(
            max_total_depth=depth, min_total_depth=depth, use_nee=use_nee
        ),
    )
    return r.render(scene_flat, cam, spp)


def _psnr8(a, b, ds=1):
    """Per-pixel comparison in tonemapped 8-bit space — the reference's
    golden-test metric (test_shading.cpp:142-186).  Returns (psnr_dB,
    firefly_count): fireflies = pixels with any channel diff > 32/255.
    ``ds``: box-downsample factor applied before the PSNR (halves the MC
    noise floor per factor of 2 while localized estimator bugs — e.g. a 2x
    pdf in one light type — still crater the score); fireflies always count
    at full resolution."""
    from ray_tpu.render.tonemap import ViewTransform, apply_view_transform

    def to8(x):
        x = np.asarray(x).reshape(RES, RES, 3)
        t = np.asarray(apply_view_transform(
            x.reshape(-1, 3), ViewTransform.STANDARD, 0.0)).reshape(x.shape)
        return np.clip(t * 255.0, 0, 255).astype(np.float32)

    a8, b8 = to8(a), to8(b)
    d_full = np.abs(a8 - b8)
    if ds > 1:
        k = RES // ds
        a8 = a8.reshape(k, ds, k, ds, 3).mean(axis=(1, 3))
        b8 = b8.reshape(k, ds, k, ds, 3).mean(axis=(1, 3))
    mse = float(((a8 - b8) ** 2).mean())
    psnr = -10.0 * np.log10(max(mse, 1e-12) / 255.0 ** 2)
    return psnr, int((d_full > 32.0).any(axis=-1).sum())


@pytest.fixture(scope="module")
def furnace_white():
    sc, cam = furnace_scene(
        MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(1, 1, 1), roughness=0.0)
    )
    return sc.finalize(), cam


def test_furnace_white_sphere(furnace_white):
    flat, cam = furnace_white
    img = _render(flat, cam, spp=16)
    # center of image = sphere; convex diffuse body: L = albedo * env = 1
    center = img[RES // 2 - 4 : RES // 2 + 4, RES // 2 - 4 : RES // 2 + 4]
    assert abs(center.mean() - 1.0) < 0.03, center.mean()
    # background = env = 1
    assert abs(img[:3, :3].mean() - 1.0) < 1e-5


def test_furnace_albedo_scaling():
    sc, cam = furnace_scene(
        MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0.5, 0.25, 0.75), roughness=0.0)
    )
    flat = sc.finalize()
    img = _render(flat, cam, spp=16)
    center = img[RES // 2 - 4 : RES // 2 + 4, RES // 2 - 4 : RES // 2 + 4]
    got = center.mean(axis=(0, 1))
    np.testing.assert_allclose(got, [0.5, 0.25, 0.75], atol=0.04)


def test_furnace_oren_rough():
    # Oren-Nayar with sigma>0 still (approximately) conserves energy
    sc, cam = furnace_scene(
        MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(1, 1, 1), roughness=0.5)
    )
    flat = sc.finalize()
    img = _render(flat, cam, spp=16)
    center = img[RES // 2 - 4 : RES // 2 + 4, RES // 2 - 4 : RES // 2 + 4]
    # the Fujii-style Oren-Nayar the reference uses (ShadeRef.cpp:403) loses
    # ~12% directional albedo at sigma=0.5 — same behavior here
    assert 0.82 < center.mean() < 1.05, center.mean()


def test_nee_consistency_cornell():
    sc, cam = cornell_scene("emissive_quad")
    flat = sc.finalize()
    a = _render(flat, cam, spp=48, depth=3, use_nee=True)
    b = _render(flat, cam, spp=192, depth=3, use_nee=False)
    # means converge to the same energy
    rel = abs(a.mean() - b.mean()) / max(a.mean(), 1e-9)
    assert rel < 0.05, (a.mean(), b.mean())
    # per-pixel agreement, 4x-downsampled to sit above the BSDF-only noise
    # floor (calibrated: 16.6 dB / 460 fireflies at full res, ~ +12 dB from
    # the 4x box filter) — a 2x pdf error in the emissive-tri sampling
    # drops this to ~13 dB
    psnr, ff = _psnr8(a, b, ds=4)
    assert psnr >= 20.0, (psnr, ff)
    assert ff <= 700, (psnr, ff)


def test_determinism_same_seed():
    sc, cam = cornell_scene("emissive_quad")
    flat = sc.finalize()
    a = _render(flat, cam, spp=2)
    b = _render(flat, cam, spp=2)
    np.testing.assert_array_equal(a, b)


def test_different_iterations_differ():
    sc, cam = cornell_scene("emissive_quad")
    flat = sc.finalize()
    r = Renderer(
        RenderSettings(RES, RES),
        PassSettings(max_total_depth=3, min_total_depth=3),
    )
    s1 = np.asarray(r.render_sample(flat, cam)["color"]).copy()
    s2 = np.asarray(r.render_sample(flat, cam)["color"])
    assert not np.array_equal(s1, s2)


def test_visible_analytic_light_consistency():
    """With IntersectAreaLights, BSDF rays see sphere/rect lights directly,
    so NEE-on and NEE-off renders must converge to the same image."""
    for kind in ["sphere", "rect"]:
        sc, cam = cornell_scene(kind, light_power=4.0)
        flat = sc.finalize()
        a = _render(flat, cam, spp=32, depth=3, use_nee=True)
        b = _render(flat, cam, spp=256, depth=3, use_nee=False)
        rel = abs(a.mean() - b.mean()) / max(a.mean(), 1e-9)
        assert rel < 0.08, (kind, a.mean(), b.mean())
        # per-pixel agreement (calibrated: sphere 22.7 dB/149 ff, rect
        # 23.6 dB/114 ff at these spp) — a 2x pdf typo in either light
        # type craters PSNR to ~12-15 dB
        psnr, ff = _psnr8(a, b)
        assert psnr >= 20.0, (kind, psnr, ff)
        assert ff <= 300, (kind, psnr, ff)
        # the light itself is directly visible (bright pixels exist)
        assert a.max() > 3.0, kind


def test_analytic_lights_illuminate():
    for kind in ["rect", "sphere", "dir"]:
        sc, cam = cornell_scene(kind)
        flat = sc.finalize()
        img = _render(flat, cam, spp=8)
        assert img.mean() > 0.01, kind
        assert np.isfinite(img).all(), kind


def test_checkpoint_resume_bitexact(tmp_path, furnace_white):
    """Progressive state round-trips through disk: N samples, save, resume
    in a fresh Renderer, continue — must match an uninterrupted run
    bit-for-bit (SURVEY §5 checkpoint/resume; determinism is the property
    path-replay backprop depends on)."""
    flat, cam = furnace_white
    ps = PassSettings(max_total_depth=3, min_total_depth=3)

    r_full = Renderer(RenderSettings(RES, RES), ps)
    img_full = r_full.render(flat, cam, 6)

    r_a = Renderer(RenderSettings(RES, RES), ps)
    r_a.render(flat, cam, 3)
    path = str(tmp_path / "ckpt.npz")
    r_a.save_state(path)

    r_b = Renderer(RenderSettings(RES, RES), ps)
    r_b.load_state(path)
    assert r_b.iteration == 3
    img_resumed = r_b.render(flat, cam, 3)

    np.testing.assert_array_equal(img_resumed, img_full)


def test_stats_collection(furnace_white):
    flat, cam = furnace_white
    r = Renderer(
        RenderSettings(RES, RES, collect_stats=True),
        PassSettings(max_total_depth=2, min_total_depth=2),
    )
    r.render(flat, cam, 2)
    s = r.get_stats()
    assert s["samples"] == 2
    assert s["time_render_us"] > 0
    assert s["rays_traced"] > 2 * RES * RES  # at least primaries per sample
