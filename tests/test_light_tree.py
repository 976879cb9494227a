"""Hierarchical light tree: build invariants, descent pdf correctness, and
render consistency vs CDF picking (the reference's USE_HIERARCHICAL_NEE path
vs its flat fallback, internal/CoreRef.cpp:3271-3316)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ray_tpu.scene.light_tree import build_light_tree, light_bounds_and_cones
from ray_tpu.scene.lights import LightDesc, LightType
from ray_tpu.scene.scene import Scene
from ray_tpu.scene.camera import make_camera
from ray_tpu.scene.materials import MaterialDesc, ShadingNode


def _many_light_descs(n=12, seed=0):
    rng = np.random.default_rng(seed)
    descs = []
    for i in range(n):
        p = rng.uniform(-4, 4, 3)
        kind = i % 3
        if kind == 0:
            descs.append(LightDesc(
                type=LightType.SPHERE, position=tuple(p),
                radius=0.1 + 0.2 * rng.random(),
                color=tuple(rng.uniform(0.5, 8.0, 3)),
            ))
        elif kind == 1:
            descs.append(LightDesc(
                type=LightType.RECT, position=tuple(p),
                width=0.5, height=0.8,
                color=tuple(rng.uniform(0.5, 4.0, 3)),
            ))
        else:
            descs.append(LightDesc(
                type=LightType.DISK, position=tuple(p),
                width=0.6, height=0.6,
                color=tuple(rng.uniform(0.5, 4.0, 3)),
            ))
    return descs


def _build(descs):
    bounds = light_bounds_and_cones(
        descs, np.zeros((3, 3), np.float32),
        np.array([[0, 1, 2]], np.int32), {},
    )
    return build_light_tree(bounds)


def test_tree_invariants():
    descs = _many_light_descs(12)
    lt, depth = _build(descs)
    n = lt["flux"].shape[0]
    assert depth >= 4  # 12 lights → at least ceil(log2(12))
    # root flux equals sum of light fluxes
    leaf_rows = lt["leaf_node"]
    assert np.isclose(lt["flux"][0], lt["flux"][leaf_rows].sum(), rtol=1e-5)
    # every light's leaf row encodes its own index
    for li in range(12):
        assert lt["left"][leaf_rows[li]] == ~np.int32(li)
    # parent/side links are consistent
    for i in range(n):
        if lt["left"][i] >= 0:
            assert lt["parent"][lt["left"][i]] == i
            assert lt["parent"][lt["right"][i]] == i
            assert lt["side"][lt["left"][i]] == 0
            assert lt["side"][lt["right"][i]] == 1
            # child boxes inside parent box
            for c in (lt["left"][i], lt["right"][i]):
                assert np.all(lt["lo"][c] >= lt["lo"][i] - 1e-5)
                assert np.all(lt["hi"][c] <= lt["hi"][i] + 1e-5)


def _scene_with_lights(descs):
    sc = Scene()
    sc.add_material(MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0.7, 0.7, 0.7)))
    sc.add_mesh(
        vertices=[[-6, 0, -6], [6, 0, -6], [6, 0, 6], [-6, 0, 6]],
        indices=[[0, 1, 2], [0, 2, 3]], material=0,
    )
    for d in descs:
        # keep them above the floor
        if d.position[1] < 0.3:
            d = LightDesc(**{**d.__dict__, "position": (d.position[0], abs(d.position[1]) + 0.5, d.position[2])})
        sc.add_light(d)
    return sc


def test_descent_pdf_matches_frequency():
    """Monte-Carlo pick frequencies at a fixed point match the descent pdf,
    and the leaf→root re-walk reproduces the same pdf."""
    from ray_tpu.render import light_sampling

    descs = _many_light_descs(9, seed=3)
    sc = _scene_with_lights(descs)
    scene = sc.finalize()
    assert scene.light_tree_depth > 0

    P = jnp.tile(jnp.array([[0.5, 0.7, -0.2]], jnp.float32), (4096, 1))
    u = jnp.linspace(0.0, 0.999999, 4096)
    idx, pdf, _ = light_sampling.pick_light_tree(scene, P, u)
    idx = np.asarray(idx)
    pdf = np.asarray(pdf)
    assert (pdf > 0).all()

    # stratified u → frequency ≈ pdf
    nl = scene.num_lights
    freq = np.bincount(idx, minlength=nl) / idx.shape[0]
    pdf_per_light = np.zeros(nl)
    for li in np.unique(idx):
        pdf_per_light[li] = pdf[idx == li].mean()
    np.testing.assert_allclose(freq, pdf_per_light, atol=2e-3)
    assert abs(pdf_per_light.sum() - 1.0) < 1e-2

    # re-walk pdf == descent pdf
    pdf2 = light_sampling.light_pick_pdf(scene, P, jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(pdf2), pdf, rtol=1e-4, atol=1e-6)


def test_tree_render_matches_cdf_render():
    """Both pick schemes are unbiased → equal-converged images."""
    import dataclasses

    from ray_tpu.render.renderer import Renderer, RenderSettings
    from ray_tpu.render.integrator import PassSettings

    descs = _many_light_descs(6, seed=5)
    sc = _scene_with_lights(descs)
    cam = make_camera(
        origin=(0.0, 3.0, 8.0), look_at=(0.0, 0.5, 0.0), fov=50.0,
    )
    scene_tree = sc.finalize()
    assert scene_tree.light_tree_depth > 0
    scene_cdf = dataclasses.replace(scene_tree, light_tree_depth=0)

    ps = PassSettings(max_total_depth=3, min_total_depth=3)
    spp = 64
    r1 = Renderer(RenderSettings(width=48, height=32), ps)
    img_tree = r1.render(scene_tree, cam, spp)
    r2 = Renderer(RenderSettings(width=48, height=32), ps)
    img_cdf = r2.render(scene_cdf, cam, spp)

    m1, m2 = img_tree.mean(), img_cdf.mean()
    assert np.isfinite(img_tree).all() and np.isfinite(img_cdf).all()
    assert m1 > 0.01
    # unbiased estimators of the same integral
    assert abs(m1 - m2) / max(m2, 1e-9) < 0.05, (m1, m2)
