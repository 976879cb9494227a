"""Golden-image parity battery vs the reference renderer.

The reference's core test strategy (tests/test_shading.cpp:34-230
``run_material_test``): render the standard material-ball scene and gate
per-test PSNR + firefly pixel counts against a converged golden.  Here the
goldens in ``tests/goldens/<name>/ref.tga`` are rendered by the *reference
renderer itself* (CPU AVX512 backend, built from /root/reference — see
tools/golden/README.md) on scene definitions both renderers share
(tests/golden_scene.py == tools/golden/golden_gen.cpp), so a pass means
ray_tpu matches the reference implementation, not merely itself.

Thresholds are the reference's own per-test values
(test_shading.cpp:351-353 + per-test overrides, extracted into
tests/goldens/manifest.json), at the reference's own per-test sample
counts.

Run via ``scripts/run_golden_tests.sh`` (sets RAY_TPU_GOLDEN=1 → real
device; renders 256x256 at up to a few hundred spp — not part of the CPU
unit suite).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
GOLDENS = os.path.join(HERE, "goldens")

pytestmark = pytest.mark.skipif(
    os.environ.get("RAY_TPU_GOLDEN", "") != "1",
    reason="golden battery runs on hardware via scripts/run_golden_tests.sh",
)


def _manifest():
    with open(os.path.join(GOLDENS, "manifest.json")) as f:
        return json.load(f)["tests"]


def _cases():
    out = []
    for t in _manifest():
        if not t.get("runnable"):
            continue
        if t["caching"] or t["partial"]:
            continue  # cache/partial variants: covered by their own tests
        if not os.path.exists(os.path.join(GOLDENS, t["name"], "ref.tga")):
            continue  # golden not generated yet
        out.append(dict(t, golden=t["name"]))
    # synthetic adaptive variant (the reference's only adaptive row,
    # complex_mat5_adaptive, is blocked by stripped textures — mirror its
    # parameters onto the runnable complex_mat6 scene against the same
    # converged golden; reference semantics: adaptive render at
    # [min_spp, spp] with variance stop vs non-adaptive golden).
    # variance_threshold=0.004 is the reference's own VarianceThreshold
    # (tests/test_shading.cpp:1469-1472: MinSampleCount=8,
    # MaxSampleCount=18, VarianceThreshold=0.004f); min_spp scales to 16
    # because complex_mat6's golden spp budget differs from mat5's 18.
    m6 = next((t for t in out if t["name"] == "complex_mat6"), None)
    if m6 is not None:
        out.append(dict(
            m6, name="complex_mat6_adaptive", min_spp=16,
            variance_threshold=0.004, golden="complex_mat6",
        ))
    # undenoised ray-flags row: the reference's ray_flags test runs through
    # its OIDN UNet (test_shading.cpp:1911-1919); ours ships a self-trained
    # 940k UNet that does not generalize to the mirror-box scene, which
    # would hide whether the FLAGS are right — test them raw as well,
    # gated by the decorrelated refspp relaxation like any non-denoise row
    rf = next((t for t in out if t["name"] == "ray_flags"), None)
    if rf is not None:
        out.append(dict(rf, name="ray_flags_raw", denoise="none",
                        golden="ray_flags"))
    return out


_CASES = _cases()


def _psnr_fireflies(out_u8, ref_u8):
    diff = np.abs(out_u8.astype(np.float32) - ref_u8.astype(np.float32))
    mse = float((diff ** 2).mean())
    psnr = -10.0 * np.log10(max(mse, 1e-12) / 255.0 ** 2)
    fireflies = int((diff > 32).any(axis=-1).sum())
    return np.floor(psnr * 100.0) / 100.0, fireflies


def _gates(entry):
    """Effective per-test gates.

    The shipped thresholds (manifest) were tuned for the ORIGINAL backdrop
    meshes, which are stripped from this checkout; the substitute room
    (tools/golden/make_env_mesh.py) is darker, so mirror-like materials
    reflect the small bright lights against dark walls and ANY renderer is
    noisier on it at equal spp — measured: the reference itself scores
    25.33 dB / 2237 fireflies on metal_mat0 at its own 10 spp, far outside
    its own 30.0 dB / 1110 budget.  So where a ``refspp.tga`` exists (the
    reference renderer run at the test's spp on the same scene,
    tools/golden: golden_gen refspp), the gate becomes
    "match the reference's own quality on this scene": PSNR >= min(floor,
    ref_psnr - 0.3) and fireflies <= max(budget, 1.25 * ref_ff)."""
    from ray_tpu.utils.image_io import read_tga

    floor, budget = entry["min_psnr"], entry["pix_thres"]
    gold_dir = entry.get("golden", entry["name"])
    ref_path = os.path.join(GOLDENS, gold_dir, "refspp.tga")
    note = ""
    if entry["denoise"] != "none":
        # refspp is an UNDENOISED reference render; its quality does not
        # calibrate a denoised-output gate — keep the shipped floor
        return floor, budget, note
    if os.path.exists(ref_path):
        gold = read_tga(os.path.join(GOLDENS, gold_dir, "ref.tga"))
        refspp = read_tga(ref_path)
        ref_psnr, ref_ff = _psnr_fireflies(refspp[..., :3], gold[..., :3])
        floor = min(floor, np.floor((ref_psnr - 0.3) * 100.0) / 100.0)
        budget = max(budget, int(1.25 * ref_ff))
        note = f" [ref@spp: {ref_psnr:.2f} dB, {ref_ff} ff]"
    return floor, budget, note


@pytest.mark.parametrize("entry", _CASES, ids=[t["name"] for t in _CASES])
def test_golden(entry):
    from golden_scene import build_scene
    from ray_tpu.render.renderer import Renderer, RenderSettings
    from ray_tpu.utils.image_io import read_tga, write_tga

    sc, cam, ps, vt = build_scene(entry)
    scene = sc.finalize()
    rs = RenderSettings(width=256, height=256)
    if entry["min_spp"] != entry["spp"]:
        # adaptive driver (reference camera min_samples/variance_threshold,
        # SceneBase.h:301-306): converged pixels stop sampling early
        rs = RenderSettings(width=256, height=256,
                            min_samples=entry["min_spp"],
                            variance_threshold=entry["variance_threshold"])
    r = Renderer(rs, ps)
    r.render(scene, cam, entry["spp"])
    if entry["denoise"] != "none":
        # reference run_material_test denoises before comparing
        # (test_shading.cpp DenoiseImage NLM/UNet paths); the golden is the
        # converged CLEAN render, so the denoiser must reach the floor
        px_lin = r.denoise_image(mode=entry["denoise"])
        from ray_tpu.render.tonemap import apply_view_transform

        px = np.asarray(apply_view_transform(
            np.asarray(px_lin).reshape(-1, 3), vt, float(cam.exposure),
        )).reshape(256, 256, 3)
    else:
        px = r.pixels(cam, vt)
    out_u8 = np.clip(px * 255.0, 0, 255).astype(np.uint8)

    ref = read_tga(os.path.join(GOLDENS, entry["golden"], "ref.tga"))[..., :3]
    psnr, fireflies = _psnr_fireflies(out_u8, ref)
    floor, budget, note = _gates(entry)

    out_dir = os.path.join(GOLDENS, entry["name"])
    os.makedirs(out_dir, exist_ok=True)
    write_tga(os.path.join(out_dir, "tpu_out.tga"), out_u8)
    print(f"{entry['name']}: PSNR {psnr:.2f}/{floor:.2f} dB, "
          f"fireflies {fireflies}/{budget}{note}")
    assert psnr >= floor, f"PSNR {psnr:.2f} < {floor:.2f} dB"
    assert fireflies <= budget, f"fireflies {fireflies} > {budget}"
