"""Multi-chip rendering: image tiles sharded over a device mesh.

The reference's parallelism is single-node: SIMD ray packets + caller-driven
tile threading over re-entrant ``RegionContext``s (RendererBase.h:78,
SURVEY.md §2.4).  The TPU-native equivalent maps the *tile* axis onto a
``jax.sharding.Mesh``: each chip renders a horizontal band of the frame
inside ``shard_map`` (scene/BVH replicated, like the reference replicates
the scene across threads), and reductions — loss terms, parameter gradients,
ray statistics — ride ICI via ``psum``.  Differentiating through the
shard_map gives gradient all-reduce for free (JAX inserts the collectives).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ray_tpu.render.integrator import PassSettings, render_tile

TILE_AXIS = "tiles"


def make_tile_mesh(devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices).reshape(-1), (TILE_AXIS,))


def render_sharded(
    scene,
    cam,
    filter_table,
    iteration,
    rand_seed,
    *,
    mesh: Mesh,
    width: int,
    height: int,
    settings: PassSettings,
    use_filter_table: bool = False,
):
    """Render one full-frame sample with rows sharded over the mesh.

    Returns the (H*W, 3) radiance (sharded over rows) and total rays traced.
    """
    n = mesh.devices.size
    assert height % n == 0, f"height {height} must divide over {n} devices"
    band_h = height // n

    def shard_fn(scene_, cam_, table_):
        band = jax.lax.axis_index(TILE_AXIS)
        y0 = (band * band_h).astype(jnp.int32)
        out = render_tile(
            scene_, cam_, table_,
            jnp.int32(0), y0, iteration, rand_seed,
            width=width, height=height, tile_w=width, tile_h=band_h,
            settings=settings, use_filter_table=use_filter_table,
        )
        rays = jax.lax.psum(out["rays_traced"], TILE_AXIS)
        return out["color"], out["base_color"], out["depth_normal"], rays

    color, base, dn, rays = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS), P()),
        # the integrator's while-loop carries mix replicated inits with
        # band-varying updates; skip the strict vma check
        check_vma=False,
    )(scene, cam, filter_table)
    return {
        "color": color,
        "base_color": base,
        "depth_normal": dn,
        "rays_traced": rays,
    }


def render_sharded_balanced(
    scene,
    cam,
    filter_table,
    iteration,
    rand_seed,
    *,
    mesh: Mesh,
    width: int,
    height: int,
    settings: PassSettings,
    use_filter_table: bool = False,
):
    """Band-sharded rendering with CROSS-CHIP RAY RE-BALANCE.

    Plain band sharding makes every chip pay its own band's worst ray:
    a band of sky finishes its BVH while-loops in a few trips while a
    band of deep geometry walks hundreds, and the frame takes as long as
    the worst band (SURVEY §5's "moral equivalent of ring attention",
    ROADMAP #10).  Here each chip generates its own band's primary rays,
    then the wavefronts are statically interleaved across the mesh with
    one ``all_to_all`` transpose: chip d ends up holding the d-th slice
    of EVERY band, so per-chip depth distributions are mixed and each
    chip's while-loop trip count approaches the mean rather than its
    band's max.  Per-lane state (pixel coords, RNG seeds) travels with
    the ray, so the estimator is unchanged; a second ``all_to_all``
    (the transpose is an involution) returns contributions to their home
    bands.  Communication cost: 2 transposes of the ray/result state per
    sample, riding ICI.

    Bit-exact vs :func:`render_sharded` by construction (per-lane math is
    untouched — lanes are only relocated between chips).
    """
    from ray_tpu.render.raygen import generate_primary_rays

    n = mesh.devices.size
    assert height % n == 0, f"height {height} must divide over {n} devices"
    band_h = height // n
    lanes = band_h * width
    assert lanes % n == 0, (
        f"per-band lane count {lanes} must divide over {n} devices"
    )

    def interleave(x):
        if x.ndim == 0 or x.shape[0] != lanes:
            return x  # scalars (cone_spread) stay replicated
        parts = x.reshape((n, lanes // n) + x.shape[1:])
        out = jax.lax.all_to_all(
            parts, TILE_AXIS, split_axis=0, concat_axis=0, tiled=False
        )
        return out.reshape((lanes,) + x.shape[1:])

    def shard_fn(scene_, cam_, table_):
        band = jax.lax.axis_index(TILE_AXIS)
        y0 = (band * band_h).astype(jnp.int32)
        rays = generate_primary_rays(
            cam_, table_, jnp.int32(0), y0, iteration, rand_seed,
            width=width, height=height, tile_w=width, tile_h=band_h,
            use_filter_table=use_filter_table,
        )
        rays = jax.tree_util.tree_map(interleave, rays)
        out = render_tile(
            scene_, cam_, table_,
            jnp.int32(0), jnp.int32(0), iteration, rand_seed,
            width=width, height=height, tile_w=width, tile_h=band_h,
            settings=settings, use_filter_table=use_filter_table,
            rays=rays,
        )
        color = interleave(out["color"])
        base = interleave(out["base_color"])
        dn = interleave(out["depth_normal"])
        rays_n = jax.lax.psum(out["rays_traced"], TILE_AXIS)
        return color, base, dn, rays_n

    color, base, dn, rays = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS), P()),
        check_vma=False,
    )(scene, cam, filter_table)
    return {
        "color": color,
        "base_color": base,
        "depth_normal": dn,
        "rays_traced": rays,
    }
