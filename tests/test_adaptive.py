"""Adaptive sampling: converged pixels stop consuming samples and the image
stays consistent with uniform sampling (reference mechanism:
required_samples skip, CoreRef.cpp:1472 + variance update
RendererCPU.h:629-658)."""

import numpy as np

from ray_tpu.render.integrator import PassSettings
from ray_tpu.render.renderer import Renderer, RenderSettings
from ray_tpu.utils.test_scenes import cornell_scene

RES = 32


def test_adaptive_converges_and_saves_samples():
    sc, cam = cornell_scene("emissive_quad")
    flat = sc.finalize()
    ps = PassSettings(max_total_depth=3, min_total_depth=3)

    uniform = Renderer(RenderSettings(RES, RES), ps)
    uniform.render(flat, cam, 48)

    adaptive = Renderer(
        RenderSettings(RES, RES, min_samples=8, variance_threshold=0.05), ps
    )
    adaptive.render(flat, cam, 48)

    counts = np.asarray(adaptive.sample_counts)
    assert counts.min() >= 8
    assert counts.max() == 48
    assert counts.mean() < 46, counts.mean()  # some pixels stopped early

    a = adaptive.radiance_image()
    u = uniform.radiance_image()
    # converged-early pixels have >= 8 good samples; image-level agreement
    err = np.abs(a - u).mean()
    assert err < 0.06, err


def test_adaptive_off_by_default():
    sc, cam = cornell_scene("emissive_quad")
    flat = sc.finalize()
    r = Renderer(
        RenderSettings(RES, RES), PassSettings(max_total_depth=3, min_total_depth=3)
    )
    r.render(flat, cam, 4)
    assert (np.asarray(r.sample_counts) == 4).all()
