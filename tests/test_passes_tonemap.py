"""Pass flags (ePassFlags, reference Types.h:85-91) + the full view-
transform family (eViewTransform, Types.h:70-83) + the SHL1 AUX buffer
(Types.h:49-54).

Flag semantics: direct + indirect must decompose the full render
(skip_direct ⊕ skip_indirect = full image), no_background removes the env
only from camera rays, lighting_only whitens the primary albedo, and
output_sh's L0 coefficient must integrate back to the pixel radiance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tpu.render.integrator import PassSettings, render_tile
from ray_tpu.render.tonemap import ViewTransform, apply_view_transform
from ray_tpu.scene.camera import build_filter_table
from ray_tpu.utils.test_scenes import cornell_scene

W = H = 32


def _render(settings, scene, cam, spp=4):
    table = jnp.asarray(build_filter_table(cam.filter, cam.filter_width))
    acc = None
    outs = None
    for it in range(1, spp + 1):
        out = render_tile(
            scene, cam, table, jnp.int32(0), jnp.int32(0),
            jnp.uint32(it), jnp.uint32(0),
            width=W, height=H, tile_w=W, tile_h=H,
            settings=settings, use_filter_table=False,
        )
        acc = out["color"] if acc is None else acc + out["color"]
        outs = out
    return np.asarray(acc) / spp, outs


@pytest.fixture(scope="module")
def scene_cam():
    sc, cam = cornell_scene("emissive_quad")
    return sc.finalize(), cam


def test_direct_plus_indirect_decomposes(scene_cam):
    scene, cam = scene_cam
    base = PassSettings(max_total_depth=4, min_total_depth=4,
                        use_path_termination=False)
    full, _ = _render(base, scene, cam)
    direct, _ = _render(
        dataclasses.replace(base, skip_indirect=True), scene, cam
    )
    indirect, _ = _render(
        dataclasses.replace(base, skip_direct=True), scene, cam
    )
    # identical RNG addressing → the split is exact per sample
    np.testing.assert_allclose(direct + indirect, full, rtol=1e-4, atol=1e-5)
    assert direct.sum() > 0 and indirect.sum() > 0


def test_no_background_removes_env_from_camera_rays(scene_cam):
    from ray_tpu.scene.camera import make_camera

    scene, _ = scene_cam
    # wide fov so edge rays miss the box and see the environment
    cam = make_camera(origin=(0, 0, -2.9), look_at=(0, 0, 0), fov=100.0)
    scene = dataclasses.replace(
        scene, env_col=jnp.array([0.3, 0.4, 0.5], jnp.float32)
    )
    base = PassSettings(max_total_depth=2, min_total_depth=2,
                        use_path_termination=False)
    # 1 spp: the sky mask comes from the sample's own depth AUX — with
    # several jittered samples an edge pixel can be sky in one and wall in
    # another, making the averaged color nonzero on a "sky" pixel
    full, o1 = _render(base, scene, cam, spp=1)
    nobg, o2 = _render(
        dataclasses.replace(base, no_background=True), scene, cam, spp=1
    )
    # camera rays that escape (depth aux t == 0 → no hit) must go black
    t_hit = np.asarray(o1["depth_normal"])[:, 3]
    sky = t_hit == 0.0
    assert sky.any(), "fixture needs some sky pixels"
    assert np.abs(nobg[sky]).max() == 0.0
    # surface pixels keep indirect env light (not all zeroed, mostly equal)
    assert nobg[~sky].sum() > 0


def test_lighting_only_whitens_primary_albedo(scene_cam):
    scene, cam = scene_cam
    base = PassSettings(max_total_depth=2, min_total_depth=2,
                        use_path_termination=False)
    lit, _ = _render(base, scene, cam)
    lonly, _ = _render(
        dataclasses.replace(base, lighting_only=True), scene, cam
    )
    # colored walls: lighting-only must not be tinted by the primary albedo
    # → strictly brighter wherever albedo < 1 and light arrives
    m = (lit.sum(1) > 1e-4)
    assert (lonly.sum(1)[m] >= lit.sum(1)[m] * 0.999).all()
    assert lonly.sum() > lit.sum() * 1.2


def test_output_sh_l0_matches_radiance(scene_cam):
    scene, cam = scene_cam
    base = PassSettings(max_total_depth=3, min_total_depth=3,
                        use_path_termination=False, output_sh=True)
    color, out = _render(base, scene, cam, spp=1)
    sh = np.asarray(out["shl1"])            # (R, 4, 3)
    assert sh.shape == (W * H, 4, 3)
    # Y0 = 0.282095 is direction-independent → L0 coeff = 0.282095 × color
    np.testing.assert_allclose(
        sh[:, 0, :], np.asarray(out["color"]) * 0.282095,
        rtol=1e-4, atol=1e-5,
    )
    # L1 coefficients are bounded by the L0 band (|Y1| ≤ 0.488603)
    l0 = np.abs(sh[:, 0, :])
    l1 = np.abs(sh[:, 1:, :]).max(axis=1)
    assert (l1 <= l0 * (0.488603 / 0.282095) + 1e-5).all()


def test_view_transform_family():
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.random((64, 3), np.float32) * 8.0)
    outs = {}
    for vt in range(10):
        o = np.asarray(apply_view_transform(c, vt))
        assert o.min() >= 0.0 and o.max() <= 1.0
        outs[vt] = o
    # all 10 curves are distinct
    vals = list(outs.values())
    for i in range(10):
        for j in range(i + 1, 10):
            assert np.abs(vals[i] - vals[j]).max() > 1e-3, (i, j)
    # filmic contrast family is monotonic in contrast: higher contrast →
    # darker shadows (low input) and brighter highlights (high input)
    lo = jnp.full((1, 3), 0.02, jnp.float32)
    hi = jnp.full((1, 3), 1.5, jnp.float32)
    lows = [float(apply_view_transform(lo, vt).mean()) for vt in range(3, 10)]
    highs = [float(apply_view_transform(hi, vt).mean()) for vt in range(3, 10)]
    assert all(a >= b - 1e-6 for a, b in zip(lows, lows[1:]))
    assert all(a <= b + 1e-6 for a, b in zip(highs, highs[1:]))


def test_exposure_is_stops():
    c = jnp.full((4, 3), 0.1, jnp.float32)
    a = apply_view_transform(c, ViewTransform.STANDARD, exposure=1.0)
    b = apply_view_transform(c * 2.0, ViewTransform.STANDARD, exposure=0.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_lut_tonemap_matches_reference_unpacking():
    """The baked 48^3 LUT path (reference internal/TonemapRef.cpp
    TonemapFilmic; data extracted verbatim by
    tools/golden/parse_tonemap_luts.py) must reproduce the reference's
    trilinear lookup: at exact grid points the output equals the unpacked
    10-bit entry, and interpolation stays inside the cell hull."""
    from ray_tpu.render.tonemap import _load_lut, tonemap_lut

    lut = _load_lut(ViewTransform.AGX)
    if lut is None:
        pytest.skip("tonemap_luts.npz not present")
    assert lut.shape == (48, 48, 48, 3)
    # grid-point exactness: encoded = i/47 -> c = e/(1-e); axis order
    # x<-R, y<-G, z<-B, entry at lut[z][y][x]
    idx = np.array([[0, 0, 0], [13, 7, 42], [47, 47, 47], [1, 30, 5]])
    e = idx / 47.0
    c = jnp.asarray(e / np.maximum(1.0 - e, 1e-7), jnp.float32)
    got = np.asarray(tonemap_lut(c, lut))
    want = lut[idx[:, 2], idx[:, 1], idx[:, 0]]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # interpolated values bounded by the 8 cell corners
    rng = np.random.default_rng(1)
    cr = jnp.asarray(rng.random((128, 3), np.float32) * 6.0)
    out = np.asarray(tonemap_lut(cr, lut))
    assert out.min() >= lut.min() - 1e-6 and out.max() <= lut.max() + 1e-6
    # differentiable in c
    g = jax.grad(lambda x: tonemap_lut(x, lut).sum())(cr)
    assert np.isfinite(np.asarray(g)).all()


def test_lut_is_default_for_baked_transforms():
    """apply_view_transform rides the baked LUT for AgX/Filmic (golden
    parity: the reference rendered the goldens through these LUTs) and
    keeps the analytic curves under use_lut=False."""
    from ray_tpu.render.tonemap import _load_lut, tonemap_lut

    if _load_lut(ViewTransform.FILMIC_HIGH_CONTRAST) is None:
        pytest.skip("tonemap_luts.npz not present")
    rng = np.random.default_rng(2)
    c = jnp.asarray(rng.random((64, 3), np.float32) * 8.0)
    for vt in (ViewTransform.AGX, ViewTransform.FILMIC_HIGH_CONTRAST):
        via_api = np.asarray(apply_view_transform(c, vt))
        direct = np.clip(np.asarray(tonemap_lut(c, _load_lut(vt))), 0, 1)
        np.testing.assert_allclose(via_api, direct, atol=1e-6)
        analytic = np.asarray(apply_view_transform(c, vt, use_lut=False))
        assert np.abs(via_api - analytic).max() > 1e-3
