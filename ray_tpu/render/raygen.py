"""Primary ray generation.

Vectorized equivalent of the reference's ``GeneratePrimaryRays``
(internal/CoreRef.cpp:1429-1553): per-pixel scrambled filter sample, optional
importance-sampled pixel filter table, thin-lens DOF with n-gon bokeh and
lens rotation/anamorphic ratio, sensor shift, and clip start/end along the
view direction.  Emits SoA ray arrays for one tile.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ray_tpu.ops import rng
from ray_tpu.ops.linalg import dot, normalize
from ray_tpu.render.bsdf.microfacet import PI


class PrimaryRays(NamedTuple):
    ro: jnp.ndarray           # (R, 3)
    rd: jnp.ndarray           # (R, 3)
    t_max: jnp.ndarray        # (R,)
    px: jnp.ndarray           # (R,) i32 absolute pixel x
    py: jnp.ndarray           # (R,) i32
    cone_spread: jnp.ndarray  # () f32


def _lookup_filter_table(table, x):
    n = table.shape[0]
    xf = x * (n - 1)
    i0 = jnp.clip(xf.astype(jnp.int32), 0, n - 1)
    i1 = jnp.minimum(i0 + 1, n - 1)
    t = xf - i0.astype(jnp.float32)
    return table[i0] * (1.0 - t) + table[i1] * t


def generate_primary_rays(
    cam,
    filter_table,
    x0,
    y0,
    iteration,
    rand_seed,
    *,
    width: int,
    height: int,
    tile_w: int,
    tile_h: int,
    use_filter_table: bool,
) -> PrimaryRays:
    """Generate rays for the tile at (x0, y0) of size (tile_w, tile_h)."""
    px = (
        x0
        + jnp.broadcast_to(
            jnp.arange(tile_w, dtype=jnp.int32)[None, :], (tile_h, tile_w)
        ).reshape(-1)
    )
    py = (
        y0
        + jnp.broadcast_to(
            jnp.arange(tile_h, dtype=jnp.int32)[:, None], (tile_h, tile_w)
        ).reshape(-1)
    )

    seed = rng.pixel_seed(px, py, rand_seed)
    sample = jnp.asarray(iteration, jnp.uint32) - 1
    rx, ry = rng.scrambled_2d_rand(jnp.uint32(rng.RAND_DIM_FILTER), seed, sample)
    if use_filter_table:
        rx = _lookup_filter_table(filter_table, rx)
        ry = _lookup_filter_table(filter_table, ry)
    fx = px.astype(jnp.float32) + rx
    fy = py.astype(jnp.float32) + ry

    k = jnp.float32(width) / jnp.float32(height)
    temp = jnp.tan(0.5 * cam.fov * PI / 180.0)
    fov_k = temp * cam.focus_distance
    spread_angle = jnp.arctan(2.0 * temp / jnp.float32(height))

    # thin-lens offset (CoreRef.cpp:1493-1520)
    lx, ly = rng.scrambled_2d_rand(jnp.uint32(rng.RAND_DIM_LENS), seed, sample)
    ox = 2.0 * lx - 1.0
    oy = 2.0 * ly - 1.0
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(
        use_x,
        0.25 * PI * (oy / jnp.where(use_x, ox, 1.0)),
        0.5 * PI - 0.25 * PI * (ox / jnp.where(use_x, 1.0, oy)),
    )
    if cam.lens_blades:
        # n-gon bokeh radius factor
        nb = jnp.float32(cam.lens_blades)
        t2 = theta + 0.5 * PI  # reference ngon_rad convention
        rad = jnp.cos(PI / nb) / jnp.cos(
            t2 - (2.0 * PI / nb) * jnp.floor((nb * t2 + PI) / (2.0 * PI))
        )
        r = r * rad
    theta = theta + cam.lens_rotation
    zero = (ox == 0.0) & (oy == 0.0)
    off_x = jnp.where(zero, 0.0, 0.5 * r * jnp.cos(theta) / cam.lens_ratio)
    off_y = jnp.where(zero, 0.0, 0.5 * r * jnp.sin(theta))
    coc = 0.5 * jnp.where(cam.fstop > 0.0, cam.focal_length / jnp.maximum(cam.fstop, 1e-6), 0.0)
    off_x = off_x * coc * cam.sensor_height
    off_y = off_y * coc * cam.sensor_height

    origin = cam.origin[None, :] + cam.side[None, :] * off_x[:, None] + cam.up[None, :] * off_y[:, None]

    # pixel position on the focus plane (CoreRef.cpp:1441-1448)
    p_x = 2.0 * fov_k * (fx / jnp.float32(width) + cam.shift[0] / k) - fov_k
    p_y = 2.0 * fov_k * (-fy / jnp.float32(height) + cam.shift[1]) + fov_k
    p = (
        cam.origin[None, :]
        + (k * p_x)[:, None] * cam.side[None, :]
        + p_y[:, None] * cam.up[None, :]
        + cam.focus_distance * cam.fwd[None, :]
    )
    if getattr(cam, "cam_type", 0) == 1:
        # orthographic: parallel rays through the image plane placed at the
        # camera origin (no DOF — the lens offset collapses to 0)
        origin = p - cam.focus_distance * cam.fwd[None, :]
        d = jnp.broadcast_to(cam.fwd[None, :], origin.shape)
        spread_angle = jnp.float32(0.0)
    else:
        d = normalize(p - origin)

    d_dot_fwd = dot(d, cam.fwd[None, :], False)
    clip_start = cam.clip_start / jnp.maximum(d_dot_fwd, 1e-6)
    ro = origin + d * clip_start[:, None]
    t_max = cam.clip_end / jnp.maximum(d_dot_fwd, 1e-6) - clip_start
    t_max = jnp.minimum(t_max, jnp.float32(3.0e30))

    return PrimaryRays(
        ro=ro, rd=d, t_max=t_max, px=px, py=py, cone_spread=spread_angle
    )
