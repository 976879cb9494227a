"""Spherical area-light sampling (Ureña rect / Arvo triangle).

Mirrors the reference's USE_SPHERICAL_AREA_LIGHT_SAMPLING path
(internal/CoreRef.cpp:1288-1427, call sites :3399-3411, :3530-3556):
the samplers must (a) produce points/directions on the light, (b) return
pdf = 1/solid-angle with the solid angle matching an independent area-form
Monte-Carlo estimate, and (c) leave NEE unbiased — the spherical and
uniform-area strategies must estimate the same irradiance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ray_tpu.render.light_sampling import (
    sample_spherical_rectangle,
    sample_spherical_triangle,
)

RNG = np.random.default_rng(7)


def _solid_angle_rect_mc(P, pos, u_ax, v_ax, n=200_000):
    """Ω = ∫_A cosθ / d² dA via uniform area sampling."""
    r = RNG.random((n, 2), np.float64)
    pts = (
        np.asarray(pos)
        + (r[:, 0:1] - 0.5) * np.asarray(u_ax)
        + (r[:, 1:2] - 0.5) * np.asarray(v_ax)
    )
    fwd = np.cross(np.asarray(u_ax, np.float64), np.asarray(v_ax, np.float64))
    area = np.linalg.norm(fwd)
    fwd = fwd / area
    vec = pts - np.asarray(P)
    d2 = np.sum(vec * vec, axis=1)
    cos = np.abs(vec @ fwd) / np.sqrt(d2)
    return float(np.mean(cos / d2) * area)


def _solid_angle_tri_mc(P, p0, p1, p2, n=200_000):
    r = RNG.random((n, 2), np.float64)
    s = np.sqrt(r[:, 0:1])
    pts = (
        np.asarray(p0) * (1 - s)
        + s * (np.asarray(p1) * (1 - r[:, 1:2]) + np.asarray(p2) * r[:, 1:2])
    )
    e1 = np.asarray(p1, np.float64) - np.asarray(p0)
    e2 = np.asarray(p2, np.float64) - np.asarray(p0)
    fwd = np.cross(e1, e2)
    area2 = np.linalg.norm(fwd)
    fwd = fwd / area2
    vec = pts - np.asarray(P)
    d2 = np.sum(vec * vec, axis=1)
    cos = np.abs(vec @ fwd) / np.sqrt(d2)
    return float(np.mean(cos / d2) * 0.5 * area2)


def test_spherical_rect_pdf_matches_solid_angle():
    P = np.array([0.3, -0.2, 0.0], np.float32)
    pos = np.array([0.1, 0.4, 2.0], np.float32)
    # rect light axes are orthogonal by construction (reference rect_light_desc)
    u_ax = np.array([1.2, 0.0, 0.1], np.float32)
    v_ax = np.cross(np.array([0.05, 1.0, -0.2]), u_ax).astype(np.float32)
    v_ax *= 0.9 / np.linalg.norm(v_ax)

    r = RNG.random((4096, 2), np.float32)
    pdf, p, ok = sample_spherical_rectangle(
        jnp.broadcast_to(P, (4096, 3)),
        jnp.broadcast_to(pos, (4096, 3)),
        jnp.broadcast_to(u_ax, (4096, 3)),
        jnp.broadcast_to(v_ax, (4096, 3)),
        jnp.asarray(r[:, 0]), jnp.asarray(r[:, 1]),
    )
    assert bool(jnp.all(ok))
    # pdf constant = 1/Ω
    assert float(jnp.std(pdf) / jnp.mean(pdf)) < 1e-4
    omega = _solid_angle_rect_mc(P, pos, u_ax, v_ax)
    assert abs(float(1.0 / jnp.mean(pdf)) - omega) / omega < 0.01

    # sampled points lie on the light plane, inside the rectangle
    fwd = np.cross(u_ax, v_ax)
    fwd = fwd / np.linalg.norm(fwd)
    pn = np.asarray(p)
    plane_d = np.abs((pn - pos) @ fwd)
    assert plane_d.max() < 2e-2
    pu = (pn - pos) @ (u_ax / np.sum(u_ax * u_ax))
    pv = (pn - pos) @ (v_ax / np.sum(v_ax * v_ax))
    assert pu.min() > -0.51 and pu.max() < 0.51
    assert pv.min() > -0.51 and pv.max() < 0.51


def test_spherical_tri_pdf_matches_solid_angle():
    P = np.array([0.0, 0.1, -0.2], np.float32)
    p0 = np.array([-0.8, -0.5, 1.5], np.float32)
    p1 = np.array([0.9, -0.4, 1.7], np.float32)
    p2 = np.array([0.1, 1.0, 1.4], np.float32)

    r = RNG.random((4096, 2), np.float32)
    pdf, L, ok = sample_spherical_triangle(
        jnp.broadcast_to(P, (4096, 3)),
        jnp.broadcast_to(p0, (4096, 3)),
        jnp.broadcast_to(p1, (4096, 3)),
        jnp.broadcast_to(p2, (4096, 3)),
        jnp.asarray(r[:, 0]), jnp.asarray(r[:, 1]),
    )
    assert bool(jnp.all(ok))
    assert float(jnp.std(pdf) / jnp.mean(pdf)) < 1e-4
    omega = _solid_angle_tri_mc(P, p0, p1, p2)
    assert abs(float(1.0 / jnp.mean(pdf)) - omega) / omega < 0.01

    # every sampled direction actually hits the triangle (Möller-Trumbore)
    Ln = np.asarray(L, np.float64)
    e1 = (p1 - p0).astype(np.float64)
    e2 = (p2 - p0).astype(np.float64)
    pvec = np.cross(Ln, e2)
    det = pvec @ e1
    tvec = P.astype(np.float64) - p0
    qvec = np.cross(np.broadcast_to(tvec, Ln.shape), e1)
    inv = 1.0 / det
    u = (pvec @ tvec) * inv
    v = np.sum(Ln * qvec, axis=1) * inv
    eps = 1e-3
    assert (u > -eps).all() and (v > -eps).all() and (u + v < 1 + eps).all()


def test_tiny_solid_angle_falls_back():
    """Far-away light → solid angle below threshold → valid=False."""
    P = jnp.zeros((8, 3), jnp.float32)
    pos = jnp.broadcast_to(jnp.array([0.0, 0.0, 1e4]), (8, 3))
    u_ax = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (8, 3))
    v_ax = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (8, 3))
    r = jnp.full((8,), 0.5, jnp.float32)
    _, _, ok = sample_spherical_rectangle(P, pos, u_ax, v_ax, r, r)
    assert not bool(jnp.any(ok))
    _, _, ok_t = sample_spherical_triangle(
        P, pos, pos + u_ax, pos + v_ax, r, r
    )
    assert not bool(jnp.any(ok_t))


@pytest.mark.parametrize("kind", ["rect", "tri"])
def test_nee_irradiance_matches_area_sampling(kind):
    """E[Le·cosθ_sur / pdf] must agree between the spherical strategy and a
    hand-rolled uniform-area estimator — unbiasedness of the new pdf."""
    P = np.array([0.0, 0.0, 0.0], np.float32)
    N = np.array([0.0, 0.0, 1.0], np.float64)
    pos = np.array([0.2, -0.1, 1.8], np.float32)
    u_ax = np.array([1.5, 0.1, 0.0], np.float32)
    v_ax = np.cross(np.array([0.0, 0.3, 1.0]), u_ax).astype(np.float32)
    v_ax *= 1.1 / np.linalg.norm(v_ax)
    n = 1 << 15
    r = RNG.random((n, 2), np.float32)

    if kind == "rect":
        pdf, p, ok = sample_spherical_rectangle(
            jnp.broadcast_to(P, (n, 3)), jnp.broadcast_to(pos, (n, 3)),
            jnp.broadcast_to(u_ax, (n, 3)), jnp.broadcast_to(v_ax, (n, 3)),
            jnp.asarray(r[:, 0]), jnp.asarray(r[:, 1]),
        )
        pts = np.asarray(p, np.float64)
        vec = pts - P
        d = np.linalg.norm(vec, axis=1)
        L = vec / d[:, None]
        est_sph = np.mean(np.maximum(L @ N, 0.0) / np.asarray(pdf))
        # area strategy (noisier — use more samples)
        ra = RNG.random((n * 8, 2), np.float64)
        pa = pos + (ra[:, 0:1] - 0.5) * u_ax + (ra[:, 1:2] - 0.5) * v_ax
        fwd = np.cross(u_ax, v_ax).astype(np.float64)
        area = np.linalg.norm(fwd)
        fwd /= area
        va = pa - P
        da = np.linalg.norm(va, axis=1)
        La = va / da[:, None]
        cos_l = np.abs(La @ fwd)
        pdf_a = da * da / (area * cos_l)
        est_area = np.mean(np.maximum(La @ N, 0.0) / pdf_a)
    else:
        p0, p1, p2 = pos, pos + u_ax, pos + v_ax
        pdf, L, ok = sample_spherical_triangle(
            jnp.broadcast_to(P, (n, 3)), jnp.broadcast_to(p0, (n, 3)),
            jnp.broadcast_to(p1, (n, 3)), jnp.broadcast_to(p2, (n, 3)),
            jnp.asarray(r[:, 0]), jnp.asarray(r[:, 1]),
        )
        Ln = np.asarray(L, np.float64)
        est_sph = np.mean(np.maximum(Ln @ N, 0.0) / np.asarray(pdf))
        ra = RNG.random((n * 8, 2), np.float64)
        s = np.sqrt(ra[:, 0:1])
        pa = p0 * (1 - s) + s * (p1 * (1 - ra[:, 1:2]) + p2 * ra[:, 1:2])
        e1 = (p1 - p0).astype(np.float64)
        e2 = (p2 - p0).astype(np.float64)
        fwd = np.cross(e1, e2)
        area = 0.5 * np.linalg.norm(fwd)
        fwd /= np.linalg.norm(fwd)
        va = pa - P
        da = np.linalg.norm(va, axis=1)
        La = va / da[:, None]
        cos_l = np.abs(La @ fwd)
        pdf_a = da * da / (area * cos_l)
        est_area = np.mean(np.maximum(La @ N, 0.0) / pdf_a)

    assert bool(jnp.all(ok))
    assert abs(est_sph - est_area) / est_area < 0.02


def test_sky_portal_light():
    """A rect sky portal emits the environment seen through it (reference
    CoreRef.cpp:3406-3419): NEE through the portal must pick up env_col."""
    import jax.numpy as jnp

    from ray_tpu.render.light_sampling import sample_light_source
    from ray_tpu.scene.lights import LightDesc, LightType
    from ray_tpu.scene.materials import MaterialDesc, ShadingNode
    from ray_tpu.scene.scene import Scene

    def build(portal):
        sc = Scene()
        sc.add_material(MaterialDesc(type=ShadingNode.DIFFUSE))
        sc.add_mesh(vertices=[[-9, -1, -9], [9, -1, -9], [9, -1, 9]],
                    indices=[[0, 1, 2]], material=0)
        sc.add_light(LightDesc(
            type=LightType.RECT, color=(1.0, 1.0, 1.0),
            position=(0, 2, 0), axis_u=(1, 0, 0), axis_v=(0, 0, 1),
            width=1.0, height=1.0, sky_portal=portal,
        ))
        sc.set_environment((2.0, 4.0, 8.0))
        return sc.finalize(light_tree_min_lights=99)

    P = jnp.zeros((64, 3), jnp.float32)
    T = jnp.tile(jnp.asarray([[1.0, 0, 0]], jnp.float32), (64, 1))
    B = jnp.tile(jnp.asarray([[0, 0, 1.0]], jnp.float32), (64, 1))
    N = jnp.tile(jnp.asarray([[0, 1.0, 0]], jnp.float32), (64, 1))
    r = jnp.linspace(0.01, 0.49, 64)  # always picks the rect (2 lights)
    uv = jnp.stack([r, 1.0 - r], -1)

    cols = {}
    for portal in (False, True):
        scene = build(portal)
        ls = sample_light_source(scene, P, T, B, N, r * 0.0 + 0.1, uv)
        m = np.asarray(ls.pdf) > 0
        # portal rows must be tinted by env (2,4,8); plain rect stays white
        cols[portal] = np.asarray(ls.col)[m]
    ratio = cols[True] / np.maximum(cols[False], 1e-9)
    np.testing.assert_allclose(
        ratio, np.broadcast_to([2.0, 4.0, 8.0], ratio.shape), rtol=1e-5
    )


def test_focal_length_lens_units():
    from ray_tpu.scene.camera import make_camera

    # 50mm lens on a 36mm-tall sensor → fov = 2·atan(18/50) ≈ 39.6°
    cam = make_camera(origin=(0, 0, 0), fwd=(0, 0, 1),
                      sensor_height=0.036, focal_len=0.050)
    assert abs(float(cam.fov) - 39.6) < 0.1
    assert abs(float(cam.focal_length) - 0.050) < 1e-6


def test_portal_shadow_block():
    """Portal blocker geometry (CoreRef.cpp:4533-4590): env shadow rays
    crossing a portal's FRONT side within range are blocked; back-side
    crossings, out-of-range hits, and misses pass."""
    import jax.numpy as jnp
    from ray_tpu.render.light_sampling import portal_shadow_block
    from ray_tpu.scene.lights import LightDesc, LightType
    from ray_tpu.scene.materials import MaterialDesc, ShadingNode
    from ray_tpu.scene.scene import Scene

    sc = Scene()
    sc.add_material(MaterialDesc(type=ShadingNode.DIFFUSE))
    sc.add_mesh(vertices=[[50, 0, 0], [51, 0, 0], [50, 1, 0]],
                indices=[[0, 1, 2]], material=0)
    # portal in the z=1 plane, facing -z (toward origin), 2x2
    sc.add_light(LightDesc(
        type=LightType.RECT, color=(1, 1, 1), position=(0, 0, 1),
        axis_u=(1, 0, 0), axis_v=(0, 1, 0), width=2.0, height=2.0,
        sky_portal=True))
    sc.set_environment((1.0, 1.0, 1.0))
    scene = sc.finalize()

    ro = jnp.asarray([
        [0.0, 0.0, 2.0],   # in front (+z side = front, axis u×v = +z)
        [0.0, 0.0, 0.0],   # behind: crosses back side
        [0.0, 0.0, 2.0],   # in front but pointing away
        [1.6, 0.0, 2.0],   # in front, crosses the plane outside the rect
    ], jnp.float32)
    rd = jnp.asarray([
        [0.0, 0.0, -1.0],
        [0.0, 0.0, 1.0],
        [0.0, 0.0, 1.0],
        [0.0, 0.0, -1.0],
    ], jnp.float32)
    dist = jnp.full((4,), 10.0, jnp.float32)
    blocked = np.asarray(portal_shadow_block(scene, ro, rd, dist))
    assert blocked.tolist() == [True, False, False, False], blocked
    # range: a ray stopping short of the plane is not blocked
    short = np.asarray(portal_shadow_block(
        scene, ro, rd, jnp.full((4,), 0.5, jnp.float32)))
    assert short.tolist() == [False, False, False, False], short
