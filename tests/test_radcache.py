"""Spatial radiance cache (SHARC-style) — unit + integration tests.

Reference behavior: internal/RadCacheRef.{h,cpp}, query exit
ShadeRef.cpp:1370-1392, frame loop RendererCPU.h:1010-1212, golden test
complex_mat5_caching (tests/main.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ray_tpu.render import radcache
from ray_tpu.render.integrator import PassSettings
from ray_tpu.render.renderer import Renderer, RenderSettings
from ray_tpu.utils.test_scenes import cornell_scene


def test_hash_key_distinct_and_stable():
    cam = jnp.zeros(3)
    p = jnp.asarray([
        [1.0, 2.0, 3.0],
        [1.0, 2.0, 3.0],     # same point
        [1.001, 2.0, 3.0],   # same voxel (coarse level at dist ~3.7)
        [-4.0, 0.5, 2.0],    # different voxel
        [1.0, 2.0, 30.0],    # farther: different level
    ])
    n = jnp.asarray([[0, 1, 0.]] * 4 + [[0, -1, 0.]])
    lo, hi, h = radcache.compute_hash(p, n, cam)
    lo, hi = np.asarray(lo), np.asarray(hi)
    assert lo[0] == lo[1] and hi[0] == hi[1]
    assert lo[0] == lo[2] and hi[0] == hi[2]
    assert (lo[3], hi[3]) != (lo[0], hi[0])
    assert (lo[4], hi[4]) != (lo[0], hi[0])
    # keys are never the empty sentinel (level >= 1 guarantees hi != 0)
    assert np.all((lo != 0) | (hi != 0))


def test_claim_accumulate_query_roundtrip():
    state = radcache.make_cache(entries=1 << 12, cam_pos=(0, 0, 0))
    R = 64
    rng = np.random.default_rng(0)
    # 8 distinct voxels, 8 lanes each — same key must claim ONE slot
    base = rng.uniform(-4, 4, (8, 3)).astype(np.float32)
    p = jnp.asarray(np.repeat(base, 8, axis=0))
    n = jnp.asarray(np.tile([[0, 1, 0]], (R, 1)).astype(np.float32))
    rad = jnp.ones((R, 3), jnp.float32) * 2.0
    active = jnp.ones((R,), jnp.bool_)

    state, entry, ok = radcache.claim_entries(state, p, n, active)
    assert bool(jnp.all(ok))
    e = np.asarray(entry).reshape(8, 8)
    assert all(len(set(row)) == 1 for row in e)          # one slot per voxel
    assert len({row[0] for row in e}) == 8               # distinct voxels

    state = radcache.accumulate(state, entry, rad, jnp.ones((R,), jnp.int32),
                                active)
    state = radcache.resolve(state)
    out, good = radcache.query(state, p, n, active)
    assert bool(jnp.all(good))        # count 8 == RAD_CACHE_SAMPLE_COUNT_MIN
    np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-5)


def test_resolve_count_cap_and_aging():
    state = radcache.make_cache(entries=1 << 10)
    p = jnp.asarray([[1.0, 1.0, 1.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    a = jnp.ones((1,), jnp.bool_)
    state, entry, ok = radcache.claim_entries(state, p, n, a)
    # way over the sample cap: radiance must rescale so the mean holds
    state = radcache.accumulate(
        state, entry, jnp.full((1, 3), 3.0 * 500), jnp.full((1,), 500), a
    )
    state = radcache.resolve(state)
    e = int(entry[0])
    assert int(state.cnt_prev[e]) == radcache.RAD_CACHE_SAMPLE_COUNT_MAX
    np.testing.assert_allclose(
        np.asarray(state.rad_prev[e]) / float(state.cnt_prev[e]), 3.0,
        rtol=1e-4,
    )
    # untouched resolves age it out after STALE_FRAME_NUM_MAX frames
    for _ in range(radcache.RAD_CACHE_STALE_FRAME_NUM_MAX + 1):
        state = radcache.resolve(state)
    assert int(state.cnt_prev[e]) == 0
    assert int(state.key_lo[e]) == 0 and int(state.key_hi[e]) == 0


_CACHE_RS = RenderSettings(
    32, 32, use_spatial_cache=True, cache_entries=1 << 16, cache_downsample=1
)


def test_cache_queries_terminate_paths():
    """Poison test: paint every warm voxel bright red — a query render must
    show red query-terminated pixels (proves the ShadeRef.cpp:1370-1392
    early exit actually fires, not just that tables fill up)."""
    sc, cam = cornell_scene("emissive_quad")
    flat = sc.finalize()
    ps = PassSettings(max_total_depth=5, min_total_depth=2)
    r = Renderer(_CACHE_RS, ps)
    for i in range(16):
        r.update_spatial_cache(flat, cam, rand_seed=i)
        r.resolve_spatial_cache()
    cnts = np.asarray(r.cache.cnt_prev)
    assert (cnts >= radcache.RAD_CACHE_SAMPLE_COUNT_MIN).sum() > 100

    pois = r.cache._replace(
        rad_prev=jnp.where(
            (r.cache.cnt_prev > 0)[:, None],
            jnp.stack([r.cache.cnt_prev * 10.0,
                       r.cache.cnt_prev * 0.0,
                       r.cache.cnt_prev * 0.0], -1),
            r.cache.rad_prev,
        )
    )
    r2 = Renderer(_CACHE_RS, ps)
    r2.cache = pois
    img = np.asarray(r2.render_sample(flat, cam)["color"]).reshape(32, 32, 3)
    frac = (img[..., 0] > 5.0).mean()
    assert frac > 0.2, frac


def test_cache_render_matches_ground_truth():
    """The reference validates caching against the same golden as the
    uncached render (complex_mat5_caching): the cache is an accelerator,
    not a different estimator — means must agree."""
    sc, cam = cornell_scene("emissive_quad")
    flat = sc.finalize()
    ps = PassSettings(max_total_depth=5, min_total_depth=2)

    r_ref = Renderer(RenderSettings(32, 32), ps)
    img_ref = np.asarray(r_ref.render(flat, cam, 48))

    r_c = Renderer(_CACHE_RS, ps)
    img_c = np.asarray(r_c.render(flat, cam, 48))

    n_warm = int(jnp.sum(r_c.cache.cnt_prev >= radcache.RAD_CACHE_SAMPLE_COUNT_MIN))
    assert n_warm > 100, n_warm

    rel = abs(img_c.mean() - img_ref.mean()) / img_ref.mean()
    assert rel < 0.08, (img_c.mean(), img_ref.mean())
